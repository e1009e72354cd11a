"""Minimal torch modules with checkpoint-compatible parameter names
(netMain / netShortcut / grid-cell naming), used to validate the
torch→flax weight converters numerically. These are built from the
*checkpoint key schema* (see models/convert.py docstring), not from
reference source."""
import torch
import torch.nn as tnn


def t_basic(kind, ch):
    cin, cmid, cout = ch
    if kind == 'relu-conv-relu-conv':
        main = tnn.Sequential(
            tnn.PReLU(cin, 0.25), tnn.Conv2d(cin, cmid, 3, 1, 1),
            tnn.PReLU(cmid, 0.25), tnn.Conv2d(cmid, cout, 3, 1, 1))
    else:
        main = tnn.Sequential(
            tnn.Conv2d(cin, cmid, 3, 1, 1), tnn.PReLU(cmid, 0.25),
            tnn.Conv2d(cmid, cout, 3, 1, 1))
    m = tnn.Module()
    m.netMain = main
    if cin != cout:
        m.netShortcut = tnn.Conv2d(cin, cout, 1, 1, 0)
        m.forward = lambda x: m.netMain(x) + m.netShortcut(x)
    else:
        m.forward = lambda x: m.netMain(x) + x
    return m


def t_down(ch):
    cin, cmid, cout = ch
    m = tnn.Module()
    m.netMain = tnn.Sequential(
        tnn.PReLU(cin, 0.25), tnn.Conv2d(cin, cmid, 3, 2, 1),
        tnn.PReLU(cmid, 0.25), tnn.Conv2d(cmid, cout, 3, 1, 1))
    m.forward = lambda x: m.netMain(x)
    return m


def t_up(ch):
    cin, cmid, cout = ch
    m = tnn.Module()
    m.netMain = tnn.Sequential(
        tnn.Upsample(scale_factor=2, mode='bilinear', align_corners=False),
        tnn.PReLU(cin, 0.25), tnn.Conv2d(cin, cmid, 3, 1, 1),
        tnn.PReLU(cmid, 0.25), tnn.Conv2d(cmid, cout, 3, 1, 1))
    m.forward = lambda x: m.netMain(x)
    return m


def randomize_(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.2
    module.load_state_dict(sd)
    return module
