"""Native latent-diffusion inpainting (models/ldm_inpaint.py):
conv-projection UNet converter numerics, the CLIP BPE tokenizer, and
a tiny end-to-end inpaint."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import torch

from cartoonsegmentation_tpu.models.ldm import UNet2DCondition
from cartoonsegmentation_tpu.models.ldm_inpaint import (ClipTokenizer,
                                                        LDMInpainter)
from cartoonsegmentation_tpu.models.marigold import convert_unet
from torch_twins import TorchUNet2DCondition

TINY_UNET_SD1 = dict(out_ch=4, block_out=(32, 64), layers_per_block=1,
                     heads=(1, 2), cross_attn=(True, False),
                     linear_proj=False)
TINY_VAE = dict(block_out=(32, 64), layers_per_block=1)


def test_unet_conv_proj_converter_full_numeric(rng):
    """SD1.x configuration (1x1-conv transformer projections): torch
    twin → convert → full forward matches."""
    torch.manual_seed(2)
    twin = TorchUNet2DCondition(in_ch=9, out_ch=4, block_out=(32, 64),
                                layers_per_block=1, heads=(1, 2),
                                cross_attn=(True, False), ctx=16,
                                linear_proj=False)
    twin.eval()
    variables = convert_unet(twin.state_dict(), block_out=(32, 64),
                             layers_per_block=1,
                             cross_attn=(True, False))
    model = UNet2DCondition(**TINY_UNET_SD1)
    x = rng.randn(2, 8, 8, 9).astype(np.float32)
    t = np.array([11, 500], np.int64)
    ctx = rng.randn(2, 3, 16).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(t),
                   torch.from_numpy(ctx)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x),
                                 jnp.asarray(t), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def _tiny_tokenizer(tmp_path):
    from cartoonsegmentation_tpu.models.ldm_inpaint import \
        _bytes_to_unicode
    b2u = _bytes_to_unicode()
    # CLIP-style vocab: 256 byte units, 256 byte units + </w>, then
    # merges and the two specials
    vocab = {}
    for u in b2u.values():
        vocab[u] = len(vocab)
    for u in b2u.values():
        vocab[u + '</w>'] = len(vocab)
    merges = []
    # build "hi</w>" and "cat</w>"
    for pair, merged in ((('h', 'i</w>'), 'hi</w>'),
                         (('c', 'a'), 'ca'),
                         (('ca', 't</w>'), 'cat</w>')):
        merges.append(f'{pair[0]} {pair[1]}')
        vocab[merged] = len(vocab)
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    (tmp_path / 'vocab.json').write_text(json.dumps(vocab))
    (tmp_path / 'merges.txt').write_text(
        '#version: 0.2\n' + '\n'.join(merges) + '\n')
    return ClipTokenizer(str(tmp_path / 'vocab.json'),
                         str(tmp_path / 'merges.txt')), vocab


def test_clip_tokenizer_bpe(tmp_path):
    tok, vocab = _tiny_tokenizer(tmp_path)
    ids = tok.encode('Hi, cat hi')
    assert len(ids) == 77
    assert ids[0] == vocab['<|startoftext|>']
    assert vocab['hi</w>'] in ids
    assert vocab['cat</w>'] in ids
    assert ids.count(vocab['hi</w>']) == 2      # lowercased 'Hi' too
    assert vocab[','.join([])[:0] + ',</w>'] in ids \
        if ',</w>' in vocab else True
    # padding with eos to the end
    assert ids[-1] == vocab['<|endoftext|>']


def _tiny_inpainter():
    m = LDMInpainter(steps=2, guidance=3.0, context_dim=16,
                     context_len=4, unet_cfg=TINY_UNET_SD1,
                     vae_cfg=TINY_VAE)
    m.init_random(jax.random.PRNGKey(0), latent_hw=(8, 8))
    return m


def test_ldm_inpaint_tiny_end_to_end(rng):
    m = _tiny_inpainter()
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:20, 10:22] = 255
    out = m(img, mask, res=32)
    assert out.shape == img.shape and out.dtype == np.uint8
    # pixels outside the hole are untouched (latent-composited)
    np.testing.assert_array_equal(out[mask == 0], img[mask == 0])
    # the hole was actually painted (random net, but not a copy)
    assert (out[mask > 0] != img[mask > 0]).mean() > 0.5
    # deterministic per seed
    np.testing.assert_array_equal(out, m(img, mask, res=32))


def test_pipeline_ldm_native_inpaint_type(rng):
    """inpaint_type='ldm_native' runs the in-process GuidedLDM slot
    through the Ken Burns inpaint pass."""
    from cartoonsegmentation_tpu.config import KenBurnsConfig
    from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline
    cfg = KenBurnsConfig(max_size=48, num_frame=2, depth_field=False,
                         inpaint_type='ldm_native',
                         depth_est='default',
                         point_capacity_factor=1.3)
    pipe = KenBurnsPipeline(cfg)
    pipe._ldm_native = _tiny_inpainter()   # tiny nets for the test
    img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
    state = pipe.generate_state(img)
    obj_from, obj_to = pipe.autozoom(state)
    frames = pipe.process_kenburns(state, obj_from, obj_to,
                                   inpaint=True)
    assert frames.shape == (2, 40, 48, 3)
    assert np.isfinite(frames.astype(np.float32)).all()
