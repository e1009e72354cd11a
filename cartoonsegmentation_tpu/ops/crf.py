"""Dense CRF mean-field inference (binary), TPU-native.

Replaces pydensecrf's DenseCRF2D (C++/Cython) used by the reference's
structure-aware depth refinement (kenburns_effect.py:639-668:
pairwise Gaussian sxy=1 + bilateral sxy=46/srgb=4, 5 mean-field
iterations, no normalization).

TPU formulation: the bilateral kernel at srgb=4 (σ of 4/255!) means
"pixels of essentially the same flat color interact across a wide
spatial window" — exactly the flat-shaded anime regime. We therefore
evaluate the bilateral message as **color-cluster-gated spatial
blurs**: k-means the guide into K colors, then for each cluster
m_c = G_σxy * (q ⊙ 1[cluster=c]) and the message at pixel i is the
m_c of its own cluster. The wide spatial Gaussian runs on a
downsampled lattice. All jnp; no permutohedral C++ needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _blur2d(x: jnp.ndarray, sigma: float, radius: int) -> jnp.ndarray:
    """Separable unnormalized Gaussian over (H, W, C) (center weight
    1, like pydensecrf's unnormalized kernel sums)."""
    k = jnp.exp(-0.5 * (jnp.arange(-radius, radius + 1,
                                   dtype=jnp.float32) / sigma) ** 2)
    xp = jnp.pad(x, [(radius, radius), (0, 0), (0, 0)])
    out = jnp.zeros_like(x)
    for i in range(2 * radius + 1):
        out = out + k[i] * xp[i:i + x.shape[0]]
    xp = jnp.pad(out, [(0, 0), (radius, radius), (0, 0)])
    out2 = jnp.zeros_like(x)
    for i in range(2 * radius + 1):
        out2 = out2 + k[i] * xp[:, i:i + x.shape[1]]
    return out2


def _wide_blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Unnormalized wide Gaussian: average-pool to a lattice of
    ~sigma/2 cells, blur there, bilinear back, rescale to keep the
    kernel *sum* semantics."""
    H, W, C = x.shape
    s = max(int(sigma) // 2, 1)
    gh, gw = -(-H // s), -(-W // s)
    xp = jnp.pad(x, [(0, gh * s - H), (0, gw * s - W), (0, 0)])
    pooled = xp.reshape(gh, s, gw, s, C).sum(axis=(1, 3))
    blurred = _blur2d(pooled, sigma / s, radius=max(2, int(2 * sigma / s)))
    up = jax.image.resize(blurred, (gh * s, gw * s, C), method='linear')
    return up[:H, :W]


def _kmeans_labels(colors: jnp.ndarray, k: int, iters: int = 8
                   ) -> jnp.ndarray:
    """colors (N, 3) in [0,1] → (N,) labels. Deterministic init from
    evenly spaced samples."""
    N = colors.shape[0]
    idx = (jnp.arange(k) * (N // k)).astype(jnp.int32)
    centers = colors[idx]

    def step(centers, _):
        d = jnp.sum((colors[:, None] - centers[None]) ** 2, -1)
        lbl = jnp.argmin(d, 1)
        onehot = jax.nn.one_hot(lbl, k, dtype=colors.dtype)
        sums = onehot.T @ colors
        cnts = onehot.sum(0)[:, None]
        new = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    d = jnp.sum((colors[:, None] - centers[None]) ** 2, -1)
    return jnp.argmin(d, 1)


def clustered_bilateral(q: jnp.ndarray, guide: jnp.ndarray, sxy: float,
                        num_clusters: int = 10,
                        labels=None) -> jnp.ndarray:
    """Σ_j k_bilateral(i,j) q_j with the tight-color approximation:
    interaction only within the same color cluster. Pass precomputed
    ``labels`` to avoid re-running k-means on a constant guide."""
    H, W, C = q.shape
    if labels is None:
        labels = _kmeans_labels(guide.reshape(-1, guide.shape[-1]),
                                num_clusters).reshape(H, W)
    out = jnp.zeros_like(q)
    for c in range(num_clusters):
        mask = (labels == c).astype(q.dtype)[..., None]
        out = out + mask * _wide_blur(q * mask, sxy)
    return out


@functools.partial(jax.jit, static_argnames=('iterations', 'num_clusters'))
def densecrf_binary(unary_fg: jnp.ndarray, rgb: jnp.ndarray,
                    iterations: int = 5,
                    gaussian_sxy: float = 1.0, gaussian_compat: float = 3.0,
                    bilateral_sxy: float = 46.0,
                    bilateral_compat: float = 40.0,
                    num_clusters: int = 10) -> jnp.ndarray:
    """Binary mean-field dense CRF.

    unary_fg: (H, W) foreground probability in [0, 1].
    rgb: (H, W, 3) uint8 or float image (guide).
    Returns refined foreground mask (H, W) bool.
    Parameter defaults = reference crf_refine (kenburns_effect.py:
    651-665). Messages are normalized by total kernel mass so the
    compat weights act on [0, 1] q-densities.
    """
    H, W = unary_fg.shape
    p = jnp.clip(unary_fg, 1e-5, 1 - 1e-5)
    unary = -jnp.log(jnp.stack([1 - p, p], -1))            # (H, W, 2)
    guide = rgb.astype(jnp.float32) / 255.0 \
        if rgb.dtype != jnp.float32 else rgb

    ones = jnp.ones((H, W, 1), jnp.float32)
    # k-means over the constant guide runs ONCE; the messages exclude
    # the self term (blur(q) - q), so the normalizing masses must
    # exclude the self weight too or every message is ~self/total
    # under-weighted
    labels = _kmeans_labels(guide.reshape(-1, guide.shape[-1]),
                            num_clusters).reshape(H, W)
    gauss_norm = _blur2d(ones, gaussian_sxy, 2) - ones + 1e-8
    bilat_norm = clustered_bilateral(ones, guide, bilateral_sxy,
                                     num_clusters, labels=labels) \
        - ones + 1e-8

    q = jax.nn.softmax(-unary, -1)
    for _ in range(iterations):
        m_gauss = (_blur2d(q, gaussian_sxy, 2) - q) / gauss_norm
        m_bilat = (clustered_bilateral(q, guide, bilateral_sxy,
                                       num_clusters, labels=labels)
                   - q) / bilat_norm
        msg = gaussian_compat * m_gauss + bilateral_compat * m_bilat
        pairwise = msg[..., ::-1]   # Potts: penalized by other label
        q = jax.nn.softmax(-unary - pairwise, -1)
    return q[..., 1] > q[..., 0]
