"""cartoonsegmentation_tpu — TPU-native (JAX/XLA/Pallas) anime instance
segmentation + 3D Ken Burns + instance-aware style editing framework.

A ground-up TPU re-design of the capabilities of
``CartoonSegmentation/CartoonSegmentation`` (see SURVEY.md):

- instance segmentation of anime/cartoon characters (RTMDet-Ins, Flax)
- 3D Ken Burns video synthesis (depth -> point cloud -> forward splat
  render -> disocclusion fill -> depth-of-field bokeh), all on device
- instance-aware style editing via an out-of-process SD-webui adapter

Design stance (vs. the CUDA/torch reference):
- static shapes everywhere: fixed-capacity point clouds, padded
  instances, fixed-size NMS — one compiled XLA graph per stage
- the CuPy RawKernels (z-buffer splat, degrid, disocclusion fill,
  bokeh) become deterministic scatter/gather jnp programs + Pallas
- per-frame host round-trips are eliminated: the 75-frame render loop
  is a single `lax.scan`, frames leave the device once as (T,H,W,3)u8
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get('JAX_PLATFORMS'):
    # Honor an explicit JAX_PLATFORMS env var even when a site hook
    # (e.g. a TPU-tunnel sitecustomize) force-registered another
    # platform after reading it — user intent wins.
    try:
        import jax as _jax
        _jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
    except Exception:  # backends already initialized — leave as-is
        pass

from . import utils  # noqa: F401
