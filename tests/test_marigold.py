"""Native Marigold (models/ldm.py + models/marigold.py) tests:
converter full-numeric twins, scheduler math, ensemble merge, and a
tiny end-to-end depth estimation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from cartoonsegmentation_tpu.models.ldm import (
    DDIMScheduler, LCMScheduler, UNet2DCondition, AutoencoderEncoder,
    AutoencoderDecoder, make_alphas_cumprod)
from cartoonsegmentation_tpu.models.marigold import (
    MarigoldDepth, convert_unet, convert_vae, ensemble_depths)
from torch_twins import TorchUNet2DCondition, TorchAutoencoderKL

TINY_UNET = dict(out_ch=4, block_out=(32, 64), layers_per_block=1,
                 heads=(1, 2), cross_attn=(True, False))
TINY_VAE = dict(block_out=(32, 64), layers_per_block=1)


def test_unet_converter_full_numeric(rng):
    """Random-weight torch twin (diffusers key schema) → convert →
    full forward must match."""
    torch.manual_seed(0)
    twin = TorchUNet2DCondition(in_ch=8, out_ch=4, block_out=(32, 64),
                                layers_per_block=1, heads=(1, 2),
                                cross_attn=(True, False), ctx=16)
    twin.eval()
    sd = twin.state_dict()
    variables = convert_unet(sd, block_out=(32, 64),
                             layers_per_block=1,
                             cross_attn=(True, False))
    model = UNet2DCondition(**TINY_UNET)

    x = rng.randn(2, 8, 8, 8).astype(np.float32)
    t = np.array([3, 977], np.int64)
    ctx = rng.randn(2, 2, 16).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(t),
                   torch.from_numpy(ctx)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x),
                                 jnp.asarray(t), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_vae_converter_full_numeric(rng):
    torch.manual_seed(1)
    twin = TorchAutoencoderKL(block_out=(32, 64), layers_per_block=1)
    twin.eval()
    sd = twin.state_dict()
    ve, vd = convert_vae(sd, block_out=(32, 64), layers_per_block=1)
    enc = AutoencoderEncoder(**TINY_VAE)
    dec = AutoencoderDecoder(**TINY_VAE)

    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        rmean, rlogvar = twin.encode(
            torch.from_numpy(x).permute(0, 3, 1, 2))
    gmean, glogvar = enc.apply(ve, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gmean),
                               rmean.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(glogvar),
                               rlogvar.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)

    z = rng.randn(1, 8, 8, 4).astype(np.float32)
    with torch.no_grad():
        rdec = twin.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    gdec = dec.apply(vd, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(gdec),
                               rdec.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)


def test_ddim_step_reconstructs_exactly(rng):
    """For a sample built as sqrt(a)x0 + sqrt(1-a)eps, a DDIM step
    with the true eps (or v) must land exactly on the t_prev point of
    the same (x0, eps) trajectory."""
    acp = make_alphas_cumprod()
    x0 = jnp.asarray(rng.randn(4, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(4, 4).astype(np.float32))
    for pred in ('epsilon', 'v'):
        sch = DDIMScheduler(10, prediction_type=pred)
        i = 2
        t, t_prev = int(sch.timesteps[i]), int(sch.timesteps[i + 1])
        a, ap = float(acp[t]), float(acp[t_prev])
        sample = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
        model_out = eps if pred == 'epsilon' else \
            np.sqrt(a) * eps - np.sqrt(1 - a) * x0
        got = sch.step(jnp.asarray(model_out), i, sample)
        want = np.sqrt(ap) * x0 + np.sqrt(1 - ap) * eps
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_ddim_sd1x_config(rng):
    """The SD1.x scheduler configuration (leading spacing with
    steps_offset=1, set_alpha_to_one=False): every timestep is
    shifted up by one vs plain leading, and the FINAL step jumps to
    alpha_cumprod[0] instead of exactly 1.0 — matching the diffusers
    DDIMScheduler the runwayml inpainting checkpoint ships."""
    from cartoonsegmentation_tpu.models.ldm import spaced_timesteps
    plain = spaced_timesteps(10, spacing='leading')
    off = spaced_timesteps(10, spacing='leading', steps_offset=1)
    np.testing.assert_array_equal(off, plain + 1)

    acp = make_alphas_cumprod()
    sch = DDIMScheduler(10, prediction_type='epsilon',
                        spacing='leading', steps_offset=1,
                        set_alpha_to_one=False)
    x0 = rng.randn(4, 4).astype(np.float32)
    eps = rng.randn(4, 4).astype(np.float32)
    i = sch.num_steps - 1                       # final step
    t = int(sch.timesteps[i])
    a = float(acp[t])
    sample = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
    got = sch.step(jnp.asarray(eps), i, jnp.asarray(sample))
    ap = float(acp[0])                          # NOT 1.0
    want = np.sqrt(ap) * x0 + np.sqrt(1 - ap) * eps
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)
    assert abs(sch.final_alpha - ap) < 1e-12 and ap != 1.0


def test_lcm_final_step_is_denoised(rng):
    """The last LCM step returns the boundary-condition denoised
    estimate c_skip*x + c_out*x0 with no re-noising."""
    sch = LCMScheduler(4, prediction_type='epsilon')
    acp = sch.acp
    i = sch.num_steps - 1
    t = int(sch.timesteps[i])
    a = float(acp[t])
    x0 = rng.randn(3, 3).astype(np.float32)
    eps = rng.randn(3, 3).astype(np.float32)
    sample = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
    got = sch.step(jnp.asarray(eps), i, jnp.asarray(sample),
                   jax.random.PRNGKey(0))
    st = t * sch.timestep_scaling
    c_skip = sch.sigma_data ** 2 / (st ** 2 + sch.sigma_data ** 2)
    c_out = st / np.sqrt(st ** 2 + sch.sigma_data ** 2)
    want = c_skip * sample + c_out * x0
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                               atol=1e-5)


def test_ensemble_depths_affine_invariant(rng):
    """Members that are affine transforms (+noise) of one depth map
    merge back to its min-max normalization."""
    g = np.cumsum(rng.rand(24, 24), axis=0).astype(np.float32)
    members = []
    for (a, b) in ((1.0, 0.0), (3.0, -1.0), (0.5, 7.0), (2.0, 2.0),
                   (1.5, -0.5)):
        members.append(a * g + b + rng.randn(24, 24).astype(np.float32)
                       * 1e-3)
    merged = np.asarray(ensemble_depths(jnp.asarray(np.stack(members))))
    want = (g - g.min()) / (g.max() - g.min())
    assert merged.shape == (24, 24)
    np.testing.assert_allclose(merged, want, atol=5e-3)


def _tiny_marigold(**kw):
    m = MarigoldDepth(processing_res=32, denoise_steps=2,
                      ensemble_size=2, unet_cfg=dict(
                          TINY_UNET, heads=(1, 1)),
                      vae_cfg=TINY_VAE, context_dim=16, **kw)
    m.init_random(jax.random.PRNGKey(0), latent_hw=(4, 4))
    return m


@pytest.mark.parametrize('scheduler', ['lcm', 'ddim'])
def test_marigold_tiny_end_to_end(rng, scheduler):
    m = _tiny_marigold(scheduler=scheduler)
    img = (rng.rand(40, 32, 3) * 255).astype(np.uint8)
    depth = m(img)
    assert depth.shape == (40, 32)
    assert np.isfinite(depth).all()
    assert depth.min() >= 0.0 and depth.max() <= 1.0
    # deterministic for a fixed seed
    np.testing.assert_array_equal(depth, m(img))


def test_pipeline_marigold_depth_est(rng):
    """depth_est='marigold' drives the native model through
    generate_state (disparity conversion kenburns_effect.py:554-561)."""
    from cartoonsegmentation_tpu.config import KenBurnsConfig
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    cfg = KenBurnsConfig(max_size=48, num_frame=2, depth_field=False,
                         depth_est='marigold',
                         point_capacity_factor=1.2)
    pipe = KenBurnsPipeline(cfg)
    pipe._marigold = _tiny_marigold()   # tiny nets for the test
    img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img)
    disp = np.asarray(state.disparity[..., 0])
    assert disp.shape == (32, 48)
    assert np.isfinite(disp).all()
    assert disp.min() > 0.0  # zeros replaced by min positive


def test_marigold_kwargs_yaml_mapping():
    """Reference marigold_kwargs yaml block maps onto the typed
    config fields."""
    from cartoonsegmentation_tpu.config import build_kenburns_cfg
    cfg = build_kenburns_cfg({
        'depth_est': 'marigold',
        'marigold_kwargs': {'denoise_steps': 7, 'ensemble_size': 3,
                            'processing_res': 512,
                            'checkpoint': 'x'}})
    assert cfg.marigold_steps == 7
    assert cfg.marigold_ensemble == 3
    assert cfg.marigold_res == 512
