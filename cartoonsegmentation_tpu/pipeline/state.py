"""Ken Burns pipeline state as a static-shape pytree.

Replaces the reference's mutable ``KenBurnsConfig`` tensor-state bag
(kenburns_effect.py:207-366: tenRawImage/tenRawDisparity/.../
tenInpaPoints) whose point cloud *grows* after each inpaint pass
(kenburns_effect.py:472-512). TPU design: a fixed-capacity cloud
(P = capacity_factor · H · W) with invalid slots encoded as z=0
points (dropped by the splat renderer), appended to by a masked
scatter (SURVEY.md §7.0/§7.3-4).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..instances import Instances
from ..ops.camera import DepthRange


@struct.dataclass
class PointCloud:
    """Fixed-capacity 3D point store; payload = BGR color + disparity
    + depth (the channels the frame renderer scatters)."""
    points: jnp.ndarray   # (P, 3) xyz; invalid slots have z = 0
    colors: jnp.ndarray   # (P, 3)
    disparity: jnp.ndarray  # (P,)
    depth: jnp.ndarray      # (P,)
    count: jnp.ndarray      # () int32 — number of live slots

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @staticmethod
    def with_capacity(capacity: int) -> 'PointCloud':
        return PointCloud(
            points=jnp.zeros((capacity, 3), jnp.float32),
            colors=jnp.zeros((capacity, 3), jnp.float32),
            disparity=jnp.zeros((capacity,), jnp.float32),
            depth=jnp.zeros((capacity,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def shrink_to(self, capacity: int) -> 'PointCloud':
        """Slice to a smaller static capacity (appends are compact, so
        live slots are a prefix; trailing slots are z=0 → dropped by
        the renderer). Used after the inpaint passes so the per-frame
        splat only touches a snug buffer."""
        capacity = min(capacity, self.capacity)
        return PointCloud(
            points=self.points[:capacity],
            colors=self.colors[:capacity],
            disparity=self.disparity[:capacity],
            depth=self.depth[:capacity],
            count=jnp.minimum(self.count, capacity),
        )

    def append_masked(self, points, colors, disparity, depth, mask
                      ) -> 'PointCloud':
        """Append entries where ``mask`` is True (compacted), dropping
        overflow beyond capacity. All args flat (M, ...)."""
        P = self.capacity
        mask = mask.astype(jnp.int32)
        pos = self.count + jnp.cumsum(mask) - 1
        ok = (mask > 0) & (pos < P)
        idx = jnp.where(ok, pos, P)  # P → dropped
        return PointCloud(
            points=self.points.at[idx].set(points, mode='drop'),
            colors=self.colors.at[idx].set(colors, mode='drop'),
            disparity=self.disparity.at[idx].set(disparity, mode='drop'),
            depth=self.depth.at[idx].set(depth, mode='drop'),
            count=jnp.minimum(self.count + mask.sum(), P).astype(jnp.int32),
        )


@struct.dataclass
class KenBurnsState:
    """Everything ``process_kenburns`` needs, entirely on device."""
    image: jnp.ndarray        # (H, W, 3) BGR float32 in [0,1]
    disparity: jnp.ndarray    # (H, W, 1) normalized to baseline
    depth: jnp.ndarray        # (H, W, 1)
    raw_points: jnp.ndarray   # (H*W, 3) validity-masked unprojection
    depth_min: jnp.ndarray    # () — DepthRange pieces (pytree leaves)
    depth_min_u: jnp.ndarray
    depth_min_v: jnp.ndarray
    cloud: PointCloud
    instances: Instances

    @property
    def hw(self):
        return self.image.shape[0], self.image.shape[1]

    @property
    def depth_range(self) -> DepthRange:
        return DepthRange(self.depth_min, self.depth_min_u,
                          self.depth_min_v)
