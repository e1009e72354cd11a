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


# ---------------------------------------------------------------------------
# LeReS twin: res101.pth checkpoint schema (encoder.* torchvision
# resnext101_32x8d names; decoder.* network_auxi FTB/FFM/AO names) —
# see models/leres.py convert_leres.
# ---------------------------------------------------------------------------


class TResNeXtBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, groups=32, base_width=8):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1,
                                groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.downsample(x) if self.downsample is not None else x
        return tF.relu(out + sc)


class TResNeXt(tnn.Module):
    def __init__(self, layers=(3, 4, 23, 3)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            stride = 1 if li == 0 else 2
            mods = []
            for b in range(blocks):
                mods.append(TResNeXtBottleneck(
                    cin, planes, stride if b == 0 else 1))
                cin = planes * 4
            setattr(self, f'layer{li + 1}', tnn.Sequential(*mods))

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        x = tF.max_pool2d(x, 3, 2, 1)
        feats = []
        for li in range(4):
            x = getattr(self, f'layer{li + 1}')(x)
            feats.append(x)
        return feats


class TFTB(tnn.Module):
    def __init__(self, cin, mid):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, mid, 3, 1, 1, bias=True)
        self.conv_branch = tnn.Sequential(
            tnn.ReLU(), tnn.Conv2d(mid, mid, 3, 1, 1, bias=True),
            tnn.BatchNorm2d(mid), tnn.ReLU(),
            tnn.Conv2d(mid, mid, 3, 1, 1, bias=True))

    def forward(self, x):
        # reference network_auxi.FTB: conv_branch[0] is ReLU(inplace=
        # True) — the in-place mutation makes the residual skip the
        # POST-relu tensor (see test_reference_source_parity.py)
        x = tF.relu(self.conv1(x))
        b = self.conv_branch[4](self.conv_branch[3](
            self.conv_branch[2](self.conv_branch[1](x))))
        return tF.relu(x + b)


class TFFM(tnn.Module):
    def __init__(self, cin, mid, out):
        super().__init__()
        self.ftb1 = TFTB(cin, mid)
        self.ftb2 = TFTB(mid, out)

    def forward(self, low, high):
        x = self.ftb1(low) + high
        x = self.ftb2(x)
        return tF.interpolate(x, scale_factor=2, mode='bilinear',
                              align_corners=True)


class TLeReSDecoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = TFTB(2048, 512)
        self.conv1 = tnn.Conv2d(512, 256, 3, 1, 1, bias=True)
        self.ffm2 = TFFM(1024, 256, 256)
        self.ffm1 = TFFM(512, 256, 256)
        self.ffm0 = TFFM(256, 256, 256)

        class _AO(tnn.Module):
            def __init__(self):
                super().__init__()
                self.adapt_conv = tnn.Sequential(
                    tnn.Conv2d(256, 128, 3, 1, 1, bias=True),
                    tnn.BatchNorm2d(128), tnn.ReLU(),
                    tnn.Conv2d(128, 1, 3, 1, 1, bias=True))
        self.outconv = _AO()

    def forward(self, feats):
        x = self.conv(feats[3])
        x = self.conv1(x)
        x = tF.interpolate(x, scale_factor=2, mode='bilinear',
                           align_corners=True)
        x = self.ffm2(feats[2], x)
        x = self.ffm1(feats[1], x)
        x = self.ffm0(feats[0], x)
        a = self.outconv.adapt_conv
        x = a[3](a[2](a[1](a[0](x))))
        return tF.interpolate(x, scale_factor=2, mode='bilinear',
                              align_corners=True)


class _TLeReSDepthNet(tnn.Module):
    """network_auxi.DepthNet naming: the ResNeXt trunk is ``encoder``."""

    def __init__(self, layers):
        super().__init__()
        self.encoder = TResNeXt(layers)


class _TLeReSDepthModel(tnn.Module):
    """multi_depth_model_woauxi.DepthModel naming."""

    def __init__(self, layers):
        super().__init__()
        self.encoder_modules = _TLeReSDepthNet(layers)
        self.decoder_modules = TLeReSDecoder()


class TorchLeReS(tnn.Module):
    """RelDepthModel with the REAL res101.pth key nesting
    (``depth_model.encoder_modules.encoder.*`` /
    ``depth_model.decoder_modules.*`` — multi_depth_model_woauxi.py:
    23-33, network_auxi.py:64-98); forward takes rgb01 NCHW and
    applies the ImageNet normalization like the flax LeReS."""

    def __init__(self, layers=(3, 4, 23, 3)):
        super().__init__()
        self.depth_model = _TLeReSDepthModel(layers)

    def forward(self, rgb01):
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        dm = self.depth_model
        return dm.decoder_modules(
            dm.encoder_modules.encoder((rgb01 - mean) / std))


# ---------------------------------------------------------------------------
# ZoeDepth twin: ZoeD_M12_N.pt checkpoint schema
# ('core.core.pretrained.model.*' BEiT, act_postprocessN readouts,
# 'core.core.scratch.*' RefineNet decoder, metric-bins head at top
# level) — see models/convert_zoedepth.py. Geometry is parameterized
# so the COMPLETE graph runs at test size.
# ---------------------------------------------------------------------------


def _timm_beit_rel_pos_index(wh, ww):
    """INDEPENDENT transcription of timm beit
    gen_relative_position_index (do NOT import the flax module's
    version here — a shared helper would blind the parity test to
    index-layout bugs, which already happened once with the swapped
    cls rows)."""
    import numpy as _np
    coords = _np.stack(_np.meshgrid(_np.arange(wh), _np.arange(ww),
                                    indexing='ij')).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel = rel.astype(_np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num = (2 * wh - 1) * (2 * ww - 1) + 3
    n = wh * ww
    idx = _np.zeros((n + 1, n + 1), _np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num - 3
    idx[0:, 0] = num - 2
    idx[0, 0] = num - 1
    return idx


class TBeitAttention(tnn.Module):
    def __init__(self, dim, heads, grid):
        super().__init__()
        rel_pos_index = _timm_beit_rel_pos_index
        self.heads = heads
        self.qkv = tnn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = tnn.Parameter(torch.zeros(dim))
        self.v_bias = tnn.Parameter(torch.zeros(dim))
        num_rel = (2 * grid[0] - 1) * (2 * grid[1] - 1) + 3
        self.relative_position_bias_table = tnn.Parameter(
            torch.zeros(num_rel, heads))
        self.register_buffer(
            'rel_idx', torch.from_numpy(rel_pos_index(*grid)),
            persistent=False)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.heads
        qkv = self.qkv(x)
        q, k, v = qkv.chunk(3, -1)
        q = q + self.q_bias
        v = v + self.v_bias

        def sp(t):
            return t.reshape(B, N, self.heads, hd).permute(0, 2, 1, 3)
        q, k, v = sp(q), sp(k), sp(v)
        bias = self.relative_position_bias_table[self.rel_idx]
        bias = bias.permute(2, 0, 1)[None]
        attn = torch.softmax(
            (q * hd ** -0.5) @ k.transpose(-2, -1) + bias, dim=-1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, C)
        return self.proj(o)


class TBeitBlock(tnn.Module):
    def __init__(self, dim, heads, grid, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TBeitAttention(dim, heads, grid)
        self.gamma_1 = tnn.Parameter(torch.ones(dim))
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)

        class _MLP(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
                self.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)

            def forward(self, x):
                return self.fc2(tF.gelu(self.fc1(x)))
        self.mlp = _MLP()
        self.gamma_2 = tnn.Parameter(torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        return x + self.gamma_2 * self.mlp(self.norm2(x))


class TBeitBackbone(tnn.Module):
    def __init__(self, img_size, dim, depth, heads, hooks):
        super().__init__()
        grid = (img_size[0] // 16, img_size[1] // 16)
        self.grid = grid
        self.hooks = hooks

        class _PE(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Conv2d(3, dim, 16, 16)
        self.patch_embed = _PE()
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.blocks = tnn.ModuleList(
            [TBeitBlock(dim, heads, grid) for _ in range(depth)])

    def forward(self, x):
        B = x.shape[0]
        h = self.patch_embed.proj(x)
        h = h.flatten(2).transpose(1, 2)
        h = torch.cat([self.cls_token.expand(B, -1, -1), h], 1)
        feats = []
        for i, blk in enumerate(self.blocks):
            h = blk(h)
            if i in self.hooks:
                feats.append(h)
        return feats


class _TRCU(tnn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = tnn.Conv2d(features, features, 3, 1, 1)
        self.conv2 = tnn.Conv2d(features, features, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(tF.relu(self.conv1(tF.relu(x))))


class _TFusion(tnn.Module):
    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = _TRCU(features)
        self.resConfUnit2 = _TRCU(features)
        self.out_conv = tnn.Conv2d(features, features, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = tF.interpolate(x, scale_factor=2, mode='bilinear',
                           align_corners=True)
        return self.out_conv(x)


class _TMLP2(tnn.Module):
    """Metric-head MLP block: _net = Conv1x1 / ReLU / Conv1x1 (+act
    applied by the caller) — zoedepth's SeedBinRegressor/Projector/
    Attractor schema (_net.0/_net.2)."""

    def __init__(self, cin, mid, cout):
        super().__init__()
        self._net = tnn.Sequential(tnn.Conv2d(cin, mid, 1), tnn.ReLU(),
                                   tnn.Conv2d(mid, cout, 1))

    def forward(self, x):
        return self._net(x)


class TorchZoeDepth(tnn.Module):
    """Complete ZoeDepth (DPT-BEiT core + metric bins head) with the
    ZoeD_M12_N checkpoint naming. Forward takes rgb01 NCHW."""

    def __init__(self, img_size=(64, 64), dim=64, depth=8, heads=4,
                 hooks=(1, 3, 5, 7), features=32,
                 out_channels=(32, 64, 96, 96), n_bins=16,
                 bin_embedding_dim=32, btlnck=48,
                 n_attractors=(16, 8, 4, 1)):
        super().__init__()
        self.n_bins = n_bins
        self.n_attractors = n_attractors
        gh, gw = img_size[0] // 16, img_size[1] // 16
        self.grid = (gh, gw)

        class _C(tnn.Module):
            pass
        pretrained = _C()
        pretrained.model = TBeitBackbone(img_size, dim, depth, heads,
                                         hooks)

        class _TReadout(tnn.Module):
            def __init__(self):
                super().__init__()
                self.project = tnn.Sequential(tnn.Linear(2 * dim, dim),
                                              tnn.GELU())
        for i in range(4):
            ap = tnn.Sequential(
                _TReadout(), tnn.Identity(), tnn.Identity(),
                tnn.Conv2d(dim, out_channels[i], 1),
                *([tnn.ConvTranspose2d(out_channels[i], out_channels[i],
                                       4, 4)] if i == 0 else
                  [tnn.ConvTranspose2d(out_channels[i], out_channels[i],
                                       2, 2)] if i == 1 else
                  [tnn.Conv2d(out_channels[i], out_channels[i], 3, 2,
                              1)] if i == 3 else []))
            pretrained.add_module(f'act_postprocess{i + 1}', ap)

        scratch = _C()
        for i in range(4):
            scratch.add_module(
                f'layer{i + 1}_rn',
                tnn.Conv2d(out_channels[i], features, 3, 1, 1,
                           bias=False))
        for i in range(1, 5):
            scratch.add_module(f'refinenet{i}', _TFusion(features))
        scratch.output_conv = tnn.Sequential(
            tnn.Conv2d(features, features // 2, 3, 1, 1), tnn.Identity(),
            tnn.Conv2d(features // 2, 32, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(32, 1, 1), tnn.ReLU(), tnn.Identity())

        core_inner = _C()
        core_inner.pretrained = pretrained
        core_inner.scratch = scratch
        core = _C()
        core.core = core_inner
        self.core = core

        # metric bins head (top-level keys)
        self.conv2 = tnn.Conv2d(features, btlnck, 1)
        self.seed_bin_regressor = _TMLP2(btlnck, 256, n_bins)
        self.seed_projector = _TMLP2(btlnck, 128, bin_embedding_dim)
        self.projectors = tnn.ModuleList(
            [_TMLP2(features, 128, bin_embedding_dim) for _ in range(4)])
        self.attractors = tnn.ModuleList(
            [_TMLP2(bin_embedding_dim, 128, n_attractors[i])
             for i in range(4)])

        class _TCLB(tnn.Module):
            def __init__(self):
                super().__init__()
                cin = 32 + 1 + bin_embedding_dim
                self.mlp = tnn.Sequential(
                    tnn.Conv2d(cin, cin // 2, 1), tnn.GELU(),
                    tnn.Conv2d(cin // 2, 4, 1))
        self.conditional_log_binomial = _TCLB()

    # -- forward pieces -------------------------------------------------
    @staticmethod
    def _resize_ac(x, h, w):
        return tF.interpolate(x, (h, w), mode='bilinear',
                              align_corners=True)

    def _dpt(self, x):
        pre = self.core.core.pretrained
        sc = self.core.core.scratch
        gh, gw = self.grid
        tokens = pre.model(x)
        levels = []
        for i, t in enumerate(tokens):
            ap = getattr(pre, f'act_postprocess{i + 1}')
            cls, patches = t[:, :1], t[:, 1:]
            r = torch.cat([patches, cls.expand_as(patches)], -1)
            r = ap[0].project(r)
            B, N, C = r.shape
            h = r.transpose(1, 2).reshape(B, C, gh, gw)
            h = ap[3](h)
            if len(ap) > 4:
                h = ap[4](h)
            levels.append(h)
        rn = [getattr(sc, f'layer{i + 1}_rn')(lv)
              for i, lv in enumerate(levels)]
        r4 = sc.refinenet4(rn[3])
        r4c = r4[:, :, :rn[2].shape[2], :rn[2].shape[3]]
        r3 = sc.refinenet3(r4c, rn[2])
        r2 = sc.refinenet2(r3, rn[1])
        r1 = sc.refinenet1(r2, rn[0])
        h = sc.output_conv[0](r1)
        h = tF.interpolate(h, scale_factor=2, mode='bilinear',
                           align_corners=True)
        out_conv_act = tF.relu(sc.output_conv[2](h))
        rel = tF.relu(sc.output_conv[4](out_conv_act))
        return rel[:, 0], {'out_conv': out_conv_act, 'l4_rn': rn[3],
                           'r4': r4, 'r3': r3, 'r2': r2, 'r1': r1}

    def forward(self, rgb01):
        x = (rgb01 - 0.5) / 0.5
        rel_depth, hooks = self._dpt(x)

        btl = self.conv2(hooks['l4_rn'])
        seed = tF.softplus(self.seed_bin_regressor(btl))
        b_prev = seed
        prev_emb = self.seed_projector(btl)
        b_centers = b_prev
        for i, lvl in enumerate(('r4', 'r3', 'r2', 'r1')):
            emb = self.projectors[i](hooks[lvl])
            pe = self._resize_ac(prev_emb, emb.shape[2], emb.shape[3])
            A = tF.softplus(self.attractors[i](emb + pe))
            bp = self._resize_ac(b_prev, emb.shape[2], emb.shape[3])
            dx = A.unsqueeze(2) - bp.unsqueeze(1)  # (B,nA,nb,H,W)
            # the reference attractor calls dist() with no args, so
            # the jit defaults alpha=300, gamma=2 rule (attractor.py:
            # 194-196) — NOT the configured alpha=1000
            delta = (dx / (1 + 300.0 * dx ** 2)).mean(1)
            b = bp + delta
            b_prev, prev_emb, b_centers = b, emb, b
        last = hooks['out_conv']
        rel = self._resize_ac(rel_depth[:, None], last.shape[2],
                              last.shape[3])
        last = torch.cat([last, rel], 1)
        emb_up = self._resize_ac(prev_emb, last.shape[2], last.shape[3])
        cat = torch.cat([last, emb_up], 1)
        pt = tF.softplus(self.conditional_log_binomial.mlp(cat)) + 1e-4
        p = pt[:, 0:1] / (pt[:, 0:1] + pt[:, 1:2])
        t = pt[:, 2:3] / (pt[:, 2:3] + pt[:, 3:4])
        t = (50.0 - 0.0212) * t + 0.0212
        K = float(self.n_bins)
        k = torch.arange(self.n_bins, dtype=torch.float32
                         ).view(1, -1, 1, 1)
        # reference log_binom is the STIRLING approximation with
        # eps=1e-7 (dist_layers.py:29-34), not exact lgamma
        seps = 1e-7
        n = torch.tensor(K - 1.0 + seps)
        ks = k + seps
        coef = (n * torch.log(n) - ks * torch.log(ks)
                - (n - ks) * torch.log(n - ks + seps))
        pc = p.clamp(1e-4, 1.0)
        omp = (1.0 - p).clamp(1e-4, 1.0)
        y = coef + k * torch.log(pc) + (K - 1 - k) * torch.log(omp)
        probs = torch.softmax(y / t, dim=1)
        centers = self._resize_ac(b_centers, probs.shape[2],
                                  probs.shape[3])
        depth = (probs * centers).sum(1, keepdim=True)
        return {'metric_depth': depth, 'rel_depth': rel_depth}


# ---------------------------------------------------------------------------
# Pix2pix depth-merge generator twin (unet_1024, norm='none' — the
# nested UnetSkipConnectionBlock schema of latest_net_G.pth; see
# models/pix2pix4depth.py)
# ---------------------------------------------------------------------------


class TUnetSkip(tnn.Module):
    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer_nc
        downconv = tnn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=False)
        downrelu = tnn.LeakyReLU(0.2, True)
        uprelu = tnn.ReLU(True)
        if outermost:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            model = [downconv, submodule, uprelu, upconv, tnn.Tanh()]
        elif innermost:
            upconv = tnn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1,
                                         bias=False)
            model = [downrelu, downconv, uprelu, upconv, tnn.Identity()]
        else:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                         bias=False)
            model = [downrelu, downconv, tnn.Identity(), submodule,
                     uprelu, upconv, tnn.Identity()]
        self.model = tnn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class TorchPix2Pix4Depth(tnn.Module):
    """UnetGenerator(2, 1, num_downs=10, ngf=64, norm='none')."""

    def __init__(self, ngf=64, num_downs=10):
        super().__init__()
        block = TUnetSkip(ngf * 8, ngf * 8, innermost=True)
        for _ in range(num_downs - 5):
            block = TUnetSkip(ngf * 8, ngf * 8, submodule=block)
        block = TUnetSkip(ngf * 4, ngf * 8, submodule=block)
        block = TUnetSkip(ngf * 2, ngf * 4, submodule=block)
        block = TUnetSkip(ngf, ngf * 2, submodule=block)
        self.model = TUnetSkip(1, ngf, input_nc=2, submodule=block,
                               outermost=True)

    def forward(self, x):
        return self.model(x)


# ---------------------------------------------------------------------------
# Full 3D-Ken-Burns net twins (checkpoint key schema of the published
# kenburns weights: netImage / netSemantics / '{r}x{c} - {r}x{c+1}'
# grid names / netDisparity / netContext / netInput — see
# models/convert.py). Used to numerically validate convert_disparity /
# convert_refine / convert_inpaint / convert_semantics end to end.
# ---------------------------------------------------------------------------


def t_grid_add_modules(m, feats):
    """Attach the grid U-net blocks with the reference's
    '{r}x{c} - ...' module names (disparity_estimation.py:124-146)."""
    n = len(feats)
    for r, f in enumerate(feats):
        for c in range(3):
            m.add_module(f'{r}x{c} - {r}x{c + 1}',
                         t_basic('relu-conv-relu-conv', (f, f, f)))
    for c in (0, 1):
        for r in range(n - 1):
            m.add_module(f'{r}x{c} - {r + 1}x{c}',
                         t_down((feats[r], feats[r + 1], feats[r + 1])))
    for c in (2, 3):
        for r in range(n - 1):
            m.add_module(f'{r + 1}x{c} - {r}x{c}',
                         t_up((feats[r + 1], feats[r], feats[r])))


def _t_grid_col_down(m, cols, col):
    for r in range(len(cols)):
        cols[r] = m._modules[f'{r}x{col - 1} - {r}x{col}'](cols[r])
        if r != 0:
            cols[r] = cols[r] + m._modules[f'{r - 1}x{col} - {r}x{col}'](
                cols[r - 1])
    return cols


def _t_grid_col_up(m, cols, col):
    import torch.nn.functional as F
    for r in range(len(cols) - 1, -1, -1):
        cols[r] = m._modules[f'{r}x{col - 1} - {r}x{col}'](cols[r])
        if r != len(cols) - 1:
            up = m._modules[f'{r + 1}x{col} - {r}x{col}'](cols[r + 1])
            up = up[..., :cols[r].shape[2], :cols[r].shape[3]]
            cols[r] = cols[r] + up
    return cols


class TorchSemanticsVGG(tnn.Module):
    """vgg19_bn 'features' schema (conv indices 0,3,7,...,36) with the
    reference Semantics forward (BGR flip + ImageNet norm + ceil-mode
    pools, disparity_estimation.py:80-113)."""

    def __init__(self):
        super().__init__()
        cfg = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
               512, 512, 512, 512, 'M']
        layers, cin = [], 3
        for v in cfg:
            if v == 'M':
                layers.append(tnn.MaxPool2d(2, 2, ceil_mode=True))
            else:
                layers += [tnn.Conv2d(cin, v, 3, padding=1),
                           tnn.BatchNorm2d(v), tnn.ReLU()]
                cin = v
        self.features = tnn.Sequential(*layers)

    def forward(self, bgr):
        import torch.nn.functional as F
        x = bgr.flip([1])
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        return self.features((x - mean) / std)


class TorchDisparity(tnn.Module):
    _feats = (32, 48, 64, 512, 512, 512)

    def __init__(self):
        super().__init__()
        self.netImage = tnn.Conv2d(3, 32, 7, 2, 3)
        self.netSemantics = tnn.Conv2d(512, 512, 3, 1, 1)
        t_grid_add_modules(self, self._feats)
        self.netDisparity = t_basic('conv-relu-conv', (32, 32, 1))

    def forward(self, image, semantics):
        import torch.nn.functional as F
        cols = [self.netImage(image)]
        cols.append(self._modules['0x0 - 1x0'](cols[0]))
        cols.append(self._modules['1x0 - 2x0'](cols[1]))
        cols.append(self._modules['2x0 - 3x0'](cols[2]) +
                    self.netSemantics(semantics))
        cols.append(self._modules['3x0 - 4x0'](cols[3]))
        cols.append(self._modules['4x0 - 5x0'](cols[4]))
        cols = _t_grid_col_down(self, cols, 1)
        cols = _t_grid_col_up(self, cols, 2)
        cols = _t_grid_col_up(self, cols, 3)
        return F.threshold(self.netDisparity(cols[0]), 0.0, 0.0)


def _t_norm(x):
    mean = x.mean([1, 2, 3], True)
    std = x.std([1, 2, 3], False, True)
    return (x - mean) / (std + 1e-7), mean, std


class TorchRefine(tnn.Module):
    def __init__(self):
        super().__init__()
        self.netImageOne = t_basic('conv-relu-conv', (3, 24, 24))
        self.netImageTwo = t_down((24, 48, 48))
        self.netImageThr = t_down((48, 96, 96))
        self.netDisparityOne = t_basic('conv-relu-conv', (1, 96, 96))
        self.netDisparityTwo = t_up((192, 96, 96))
        self.netDisparityThr = t_up((144, 48, 48))
        self.netDisparityFou = t_basic('conv-relu-conv', (72, 24, 24))
        self.netRefine = t_basic('conv-relu-conv', (24, 24, 1))

    def forward(self, image, disp):
        import torch.nn.functional as F
        imgN, _, _ = _t_norm(image)
        dispN, dmean, dstd = _t_norm(disp)
        i1 = self.netImageOne(imgN)
        i2 = self.netImageTwo(i1)
        i3 = self.netImageThr(i2)
        up = self.netDisparityOne(dispN)
        if up.shape[-2:] != i3.shape[-2:]:
            up = F.interpolate(up, size=i3.shape[-2:], mode='bilinear',
                               align_corners=False)
        up = self.netDisparityTwo(torch.cat([i3, up], 1))
        if up.shape[-2:] != i2.shape[-2:]:
            up = F.interpolate(up, size=i2.shape[-2:], mode='bilinear',
                               align_corners=False)
        up = self.netDisparityThr(torch.cat([i2, up], 1))
        if up.shape[-2:] != i1.shape[-2:]:
            up = F.interpolate(up, size=i1.shape[-2:], mode='bilinear',
                               align_corners=False)
        up = self.netDisparityFou(torch.cat([i1, up], 1))
        out = self.netRefine(up) * (dstd + 1e-7) + dmean
        return F.threshold(out, 0.0, 0.0)


class TorchInpaintUNet(tnn.Module):
    """Inpaint net minus the point-cloud render: context convs + grid
    U-net + raw heads, driven by an externally supplied
    (render, existing) pair."""
    _feats = (32, 64, 128, 256)

    def __init__(self):
        super().__init__()
        self.netContext = tnn.Sequential(
            tnn.Conv2d(4, 64, 3, 1, 1), tnn.PReLU(64, 0.25),
            tnn.Conv2d(64, 64, 3, 1, 1), tnn.PReLU(64, 0.25))
        self.netInput = t_basic('conv-relu-conv', (69, 32, 32))
        t_grid_add_modules(self, self._feats)
        self.netImage = t_basic('conv-relu-conv', (32, 32, 3))
        self.netDisparity = t_basic('conv-relu-conv', (32, 32, 1))

    def context(self, imgN, dispN):
        return self.netContext(torch.cat([imgN, dispN], 1))

    def forward(self, render, existing):
        cols = [self.netInput(torch.cat([render, existing], 1))]
        cols.append(self._modules['0x0 - 1x0'](cols[0]))
        cols.append(self._modules['1x0 - 2x0'](cols[1]))
        cols.append(self._modules['2x0 - 3x0'](cols[2]))
        cols = _t_grid_col_down(self, cols, 1)
        cols = _t_grid_col_up(self, cols, 2)
        cols = _t_grid_col_up(self, cols, 3)
        return self.netImage(cols[0]), self.netDisparity(cols[0])


# ---------------------------------------------------------------------------
# Full RTMDet-Ins twin (mmdet checkpoint key schema: backbone.stem.*,
# backbone.stage{1-4}.*, neck.*, bbox_head.* — see
# models/convert_rtmdet.py docstring). Forward semantics follow the
# published RTMDet/CSPNeXt architecture so converted weights can be
# validated numerically end to end.
# ---------------------------------------------------------------------------
import torch.nn.functional as tF


class TConvModule(tnn.Module):
    """conv(bias-free) + BN + SiLU — mmcv ConvModule equivalent."""

    def __init__(self, cin, cout, k, s=1, groups=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self._act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return tF.silu(x) if self._act else x


class TDWSep(tnn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        self.depthwise_conv = TConvModule(cin, cin, k, groups=cin)
        self.pointwise_conv = TConvModule(cin, cout, 1)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class TCSPNeXtBlock(tnn.Module):
    def __init__(self, ch, add_identity=True):
        super().__init__()
        self.conv1 = TConvModule(ch, ch, 3)
        self.conv2 = TDWSep(ch, ch, 5)
        self.add_identity = add_identity

    def forward(self, x):
        h = self.conv2(self.conv1(x))
        return h + x if self.add_identity else h


class TChannelAttention(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.fc = tnn.Conv2d(ch, ch, 1, bias=True)

    def forward(self, x):
        g = x.mean((2, 3), keepdim=True)
        return x * tF.hardsigmoid(self.fc(g))


class TCSPLayer(tnn.Module):
    def __init__(self, cin, cout, num_blocks, add_identity=True,
                 attention=False):
        super().__init__()
        mid = int(cout * 0.5)
        self.main_conv = TConvModule(cin, mid, 1)
        self.short_conv = TConvModule(cin, mid, 1)
        self.blocks = tnn.Sequential(*[
            TCSPNeXtBlock(mid, add_identity) for _ in range(num_blocks)])
        if attention:
            self.attention = TChannelAttention(2 * mid)
        self.final_conv = TConvModule(2 * mid, cout, 1)

    def forward(self, x):
        main = self.blocks(self.main_conv(x))
        h = torch.cat([main, self.short_conv(x)], 1)
        if hasattr(self, 'attention'):
            h = self.attention(h)
        return self.final_conv(h)


class TSPP(tnn.Module):
    def __init__(self, cin, cout, ks=(5, 9, 13)):
        super().__init__()
        mid = cin // 2
        self.conv1 = TConvModule(cin, mid, 1)
        self.pools = tnn.ModuleList(
            [tnn.MaxPool2d(k, 1, k // 2) for k in ks])
        self.conv2 = TConvModule(mid * (len(ks) + 1), cout, 1)

    def forward(self, x):
        h = self.conv1(x)
        return self.conv2(torch.cat([h] + [p(h) for p in self.pools], 1))


class TCSPNeXt(tnn.Module):
    _arch = ((64, 128, 3, True, False), (128, 256, 6, True, False),
             (256, 512, 6, True, False), (512, 1024, 3, False, True))

    def __init__(self, deepen=1.0, widen=1.0):
        super().__init__()
        nb = lambda n: max(round(n * deepen), 1)  # noqa: E731
        stem0 = int(64 * widen // 2)
        self.stem = tnn.Sequential(
            TConvModule(3, stem0, 3, 2), TConvModule(stem0, stem0, 3),
            TConvModule(stem0, int(64 * widen), 3))
        for si, (cin, cout, n, add_id, spp) in enumerate(self._arch):
            cin, cout = int(cin * widen), int(cout * widen)
            layers = [TConvModule(cin, cout, 3, 2)]
            if spp:
                layers.append(TSPP(cout, cout))
            layers.append(TCSPLayer(cout, cout, nb(n), add_id,
                                    attention=True))
            setattr(self, f'stage{si + 1}', tnn.Sequential(*layers))

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for si in range(4):
            x = getattr(self, f'stage{si + 1}')(x)
            if si >= 1:
                outs.append(x)
        return outs


class TPAFPN(tnn.Module):
    def __init__(self, in_channels, out_channels, num_blocks):
        super().__init__()
        ch = in_channels
        n = len(ch)
        self.reduce_layers = tnn.ModuleList(
            [TConvModule(ch[i], ch[i - 1], 1)
             for i in range(n - 1, 0, -1)])
        self.top_down_blocks = tnn.ModuleList(
            [TCSPLayer(ch[i - 1] * 2, ch[i - 1], num_blocks, False)
             for i in range(n - 1, 0, -1)])
        self.downsamples = tnn.ModuleList(
            [TConvModule(ch[i], ch[i], 3, 2) for i in range(n - 1)])
        self.bottom_up_blocks = tnn.ModuleList(
            [TCSPLayer(ch[i] * 2, ch[i + 1], num_blocks, False)
             for i in range(n - 1)])
        self.out_convs = tnn.ModuleList(
            [TConvModule(c, out_channels, 3) for c in ch])

    def forward(self, feats):
        n = len(feats)
        inner = [feats[-1]]
        for k, idx in enumerate(range(n - 1, 0, -1)):
            high = self.reduce_layers[k](inner[0])
            inner[0] = high
            up = tF.interpolate(high, scale_factor=2, mode='nearest')
            up = up[..., :feats[idx - 1].shape[-2],
                    :feats[idx - 1].shape[-1]]
            inner.insert(0, self.top_down_blocks[k](
                torch.cat([up, feats[idx - 1]], 1)))
        outs = [inner[0]]
        for idx in range(n - 1):
            down = self.downsamples[idx](outs[-1])
            outs.append(self.bottom_up_blocks[idx](
                torch.cat([down, inner[idx + 1]], 1)))
        return [conv(o) for conv, o in zip(self.out_convs, outs)]


class TMaskFeat(tnn.Module):
    def __init__(self, cin, feat=256, stacked=4, levels=3, protos=8):
        super().__init__()
        self.fusion_conv = tnn.Conv2d(levels * cin, cin, 1, bias=True)
        convs = []
        for i in range(stacked):
            convs.append(TConvModule(cin if i == 0 else feat, feat, 3))
        self.stacked_convs = tnn.Sequential(*convs)
        self.projection = tnn.Conv2d(feat, protos, 1, bias=True)

    def forward(self, feats):
        size = feats[0].shape[-2:]
        fused = [feats[0]] + [
            tF.interpolate(f, size=size, mode='bilinear',
                           align_corners=False) for f in feats[1:]]
        x = self.fusion_conv(torch.cat(fused, 1))
        return self.projection(self.stacked_convs(x))


class TRTMDetInsHead(tnn.Module):
    """SepBN head: conv weights shared across levels, per-level BN."""

    def __init__(self, cin, feat=256, stacked=2, levels=3,
                 num_classes=1, num_gen_params=169,
                 strides=(8, 16, 32)):
        super().__init__()
        self.strides = strides

        def branch():
            return tnn.ModuleList([
                tnn.ModuleList([
                    TConvModule(cin if i == 0 else feat, feat, 3)
                    for i in range(stacked)])
                for _ in range(levels)])
        self.cls_convs = branch()
        self.reg_convs = branch()
        self.kernel_convs = branch()
        # share conv weights across levels (mmdet share_conv=True)
        for ml in (self.cls_convs, self.reg_convs, self.kernel_convs):
            for lv in range(1, levels):
                for i in range(stacked):
                    ml[lv][i].conv = ml[0][i].conv
        self.rtm_cls = tnn.ModuleList(
            [tnn.Conv2d(feat, num_classes, 1) for _ in range(levels)])
        self.rtm_reg = tnn.ModuleList(
            [tnn.Conv2d(feat, 4, 1) for _ in range(levels)])
        self.rtm_kernel = tnn.ModuleList(
            [tnn.Conv2d(feat, num_gen_params, 1) for _ in range(levels)])
        self.mask_head = TMaskFeat(cin, feat=256)

    def forward(self, feats):
        cls_out, reg_out, krn_out = [], [], []
        for lv, x in enumerate(feats):
            c = r = k = x
            for m in self.cls_convs[lv]:
                c = m(c)
            for m in self.reg_convs[lv]:
                r = m(r)
            for m in self.kernel_convs[lv]:
                k = m(k)
            cls_out.append(self.rtm_cls[lv](c))
            reg_out.append(tF.relu(self.rtm_reg[lv](r))
                           * self.strides[lv])
            krn_out.append(self.rtm_kernel[lv](k))
        return cls_out, reg_out, krn_out, self.mask_head(feats)


class TorchRTMDet(tnn.Module):
    def __init__(self, deepen=1.0, widen=1.0):
        super().__init__()
        self.backbone = TCSPNeXt(deepen, widen)
        ch = tuple(int(c * widen) for c in (256, 512, 1024))
        self.neck = TPAFPN(ch, int(256 * widen),
                           max(round(3 * deepen), 1))
        self.bbox_head = TRTMDetInsHead(int(256 * widen))

    def forward(self, x):
        return self.bbox_head(self.neck(self.backbone(x)))


class _TPatchTransformer(tnn.Module):
    """ZoeD_M12_NK router schema: embedding_convPxP (1×1) +
    transformer_encoder (real torch.nn.TransformerEncoder, 4 layers,
    4 heads, ff 1024, post-LN defaults) with a zero class token and
    block sinusoidal position encoding (sin half then cos half)."""

    def __init__(self, in_channels, embedding_dim=128):
        super().__init__()
        layer = tnn.TransformerEncoderLayer(embedding_dim, 4,
                                            dim_feedforward=1024)
        self.transformer_encoder = tnn.TransformerEncoder(layer, 4)
        self.embedding_convPxP = tnn.Conv2d(in_channels, embedding_dim,
                                            1)

    def forward(self, x):
        emb = self.embedding_convPxP(x).flatten(2)      # N, E, S
        emb = tnn.functional.pad(emb, (1, 0))           # class token
        emb = emb.permute(2, 0, 1)                      # S, N, E
        S, N, E = emb.shape
        pos = torch.arange(S, dtype=torch.float32).unsqueeze(1)
        idx = torch.arange(0, E, 2, dtype=torch.float32).unsqueeze(0)
        ang = pos * torch.exp(idx * (-torch.log(
            torch.tensor(10000.0)) / E))
        pe = torch.cat([torch.sin(ang), torch.cos(ang)], dim=1)
        emb = emb + pe.unsqueeze(1)
        return self.transformer_encoder(emb)            # S, N, E


class TorchZoeDepthNK(TorchZoeDepth):
    """ZoeD_M12_NK twin: shared DPT core + per-domain ModuleDict heads
    + transformer router, with the NK checkpoint key schema
    (zoedepth_nk_v1.py:97-157)."""

    def __init__(self, img_size=(64, 64), dim=64, depth=8, heads=4,
                 hooks=(1, 3, 5, 7), features=32,
                 out_channels=(32, 64, 96, 96), n_bins=16,
                 bin_embedding_dim=32, btlnck=48,
                 n_attractors=(16, 8, 4, 1),
                 domains=('nyu', 'kitti')):
        super().__init__(img_size, dim, depth, heads, hooks, features,
                         out_channels, n_bins, bin_embedding_dim,
                         btlnck, n_attractors)
        self.domains = domains
        del self.seed_bin_regressor
        emb_mid = bin_embedding_dim // 2
        self.seed_projector = _TMLP2(btlnck, emb_mid, bin_embedding_dim)
        self.projectors = tnn.ModuleList(
            [_TMLP2(features, emb_mid, bin_embedding_dim)
             for _ in range(4)])
        self.seed_bin_regressors = tnn.ModuleDict(
            {d: _TMLP2(btlnck, emb_mid, n_bins) for d in domains})
        self.attractors = tnn.ModuleDict(
            {d: tnn.ModuleList(
                [_TMLP2(bin_embedding_dim, bin_embedding_dim,
                        n_attractors[i]) for i in range(4)])
             for d in domains})

        class _TCLBD(tnn.Module):
            def __init__(self):
                super().__init__()
                cin = 32 + bin_embedding_dim
                self.mlp = tnn.Sequential(
                    tnn.Conv2d(cin, cin // 4, 1), tnn.GELU(),
                    tnn.Conv2d(cin // 4, 4, 1))
        self.conditional_log_binomial = tnn.ModuleDict(
            {d: _TCLBD() for d in domains})
        self.patch_transformer = _TPatchTransformer(btlnck)
        self.mlp_classifier = tnn.Sequential(
            tnn.Linear(128, 128), tnn.ReLU(), tnn.Linear(128, 2))

    def forward(self, rgb01):
        x = (rgb01 - 0.5) / 0.5
        rel_depth, hooks = self._dpt(x)
        btl = self.conv2(hooks['l4_rn'])

        emb0 = self.patch_transformer(btl)[0]           # N, E
        domain_logits = self.mlp_classifier(emb0)       # N, 2
        vote = torch.softmax(domain_logits.sum(0, keepdim=True), -1)
        name = self.domains[int(torch.argmax(vote, -1).squeeze())]

        seed = tF.softplus(self.seed_bin_regressors[name](btl))
        b_prev = seed
        prev_emb = self.seed_projector(btl)
        b_centers = b_prev
        for i, lvl in enumerate(('r4', 'r3', 'r2', 'r1')):
            emb = self.projectors[i](hooks[lvl])
            pe = self._resize_ac(prev_emb, emb.shape[2], emb.shape[3])
            A = tF.softplus(self.attractors[name][i](emb + pe))
            bp = self._resize_ac(b_prev, emb.shape[2], emb.shape[3])
            dx = A.unsqueeze(2) - bp.unsqueeze(1)
            # the reference attractor calls dist() with no args, so
            # the jit defaults alpha=300, gamma=2 rule (attractor.py:
            # 194-196) — NOT the configured alpha=1000
            delta = (dx / (1 + 300.0 * dx ** 2)).mean(1)
            b = bp + delta
            b_prev, prev_emb, b_centers = b, emb, b
        last = hooks['out_conv']                        # no rel concat
        emb_up = self._resize_ac(prev_emb, last.shape[2], last.shape[3])
        cat = torch.cat([last, emb_up], 1)
        pt = tF.softplus(
            self.conditional_log_binomial[name].mlp(cat)) + 1e-4
        p = pt[:, 0:1] / (pt[:, 0:1] + pt[:, 1:2])
        t = pt[:, 2:3] / (pt[:, 2:3] + pt[:, 3:4])
        t = (50.0 - 0.0212) * t + 0.0212
        K = float(self.n_bins)
        k = torch.arange(self.n_bins, dtype=torch.float32
                         ).view(1, -1, 1, 1)
        # reference log_binom is the STIRLING approximation with
        # eps=1e-7 (dist_layers.py:29-34), not exact lgamma
        seps = 1e-7
        n = torch.tensor(K - 1.0 + seps)
        ks = k + seps
        coef = (n * torch.log(n) - ks * torch.log(ks)
                - (n - ks) * torch.log(n - ks + seps))
        pc = p.clamp(1e-4, 1.0)
        omp = (1.0 - p).clamp(1e-4, 1.0)
        y = coef + k * torch.log(pc) + (K - 1 - k) * torch.log(omp)
        probs = torch.softmax(y / t, dim=1)
        centers = self._resize_ac(b_centers, probs.shape[2],
                                  probs.shape[3])
        depth = (probs * centers).sum(1, keepdim=True)
        return {'metric_depth': depth, 'rel_depth': rel_depth,
                'domain_logits': domain_logits, 'domain': name}


def randomize_(module, seed=0, scale=0.2):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith('num_batches_tracked'):
            continue
        if k.endswith('running_var'):
            # must stay positive for BN eval
            sd[k] = torch.rand(v.shape, generator=g) * 0.8 + 0.2
        else:
            sd[k] = torch.randn(v.shape, generator=g) * scale
    module.load_state_dict(sd)
    return module


# -- latent diffusion (diffusers UNet2DConditionModel / AutoencoderKL
#    key schema: unet|vae/diffusion_pytorch_model.*) -------------------

import math as _math


class TLDMResnet(tnn.Module):
    def __init__(self, cin, cout, temb_ch=None, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        if temb_ch:
            self.time_emb_proj = tnn.Linear(temb_ch, cout)
        self.norm2 = tnn.GroupNorm(32, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(tnn.functional.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(
                tnn.functional.silu(temb))[:, :, None, None]
        h = self.conv2(tnn.functional.silu(self.norm2(h)))
        skip = self.conv_shortcut(x) if hasattr(self, 'conv_shortcut') \
            else x
        return skip + h


class TLDMAttention(tnn.Module):
    def __init__(self, ch, heads, ctx=None):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(ch, ch, bias=False)
        self.to_k = tnn.Linear(ctx or ch, ch, bias=False)
        self.to_v = tnn.Linear(ctx or ch, ch, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(ch, ch), tnn.Dropout(0.0))

    def forward(self, x, context=None):
        ctx = x if context is None else context
        B, Nq, C = x.shape
        h, d = self.heads, C // self.heads
        q = self.to_q(x).view(B, Nq, h, d).transpose(1, 2)
        k = self.to_k(ctx).view(B, -1, h, d).transpose(1, 2)
        v = self.to_v(ctx).view(B, -1, h, d).transpose(1, 2)
        a = (q @ k.transpose(-1, -2)) / _math.sqrt(d)
        out = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, Nq, C)
        return self.to_out(out)


class TGEGLU(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.proj = tnn.Linear(cin, cout * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * tnn.functional.gelu(gate)


class TLDMBasicBlock(tnn.Module):
    def __init__(self, ch, heads, ctx):
        super().__init__()
        self.norm1 = tnn.LayerNorm(ch)
        self.attn1 = TLDMAttention(ch, heads)
        self.norm2 = tnn.LayerNorm(ch)
        self.attn2 = TLDMAttention(ch, heads, ctx=ctx)
        self.norm3 = tnn.LayerNorm(ch)
        self.ff = tnn.Module()
        self.ff.net = tnn.ModuleList([
            TGEGLU(ch, ch * 4), tnn.Dropout(0.0), tnn.Linear(ch * 4, ch)])

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        h = self.ff.net[0](self.norm3(x))
        return x + self.ff.net[2](self.ff.net[1](h))


class TLDMTransformer2D(tnn.Module):
    """linear_proj=True is the SD2 configuration (Dense on tokens);
    False is SD1.x (1x1 convs)."""

    def __init__(self, ch, heads, ctx, depth=1, linear_proj=True):
        super().__init__()
        self.linear_proj = linear_proj
        self.norm = tnn.GroupNorm(32, ch, eps=1e-6)
        if linear_proj:
            self.proj_in = tnn.Linear(ch, ch)
            self.proj_out = tnn.Linear(ch, ch)
        else:
            self.proj_in = tnn.Conv2d(ch, ch, 1)
            self.proj_out = tnn.Conv2d(ch, ch, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TLDMBasicBlock(ch, heads, ctx) for _ in range(depth)])

    def forward(self, x, context):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x)
        if self.linear_proj:
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h)
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        for blk in self.transformer_blocks:
            h = blk(h, context)
        if self.linear_proj:
            h = self.proj_out(h)
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        else:
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
            h = self.proj_out(h)
        return h + res


def _t_downsampler(cout, vae=False):
    m = tnn.Module()
    m.conv = tnn.Conv2d(cout, cout, 3, 2, 0 if vae else 1)
    if vae:
        m.forward = lambda x: m.conv(
            tnn.functional.pad(x, (0, 1, 0, 1)))
    else:
        m.forward = lambda x: m.conv(x)
    return m


def _t_upsampler(cout):
    m = tnn.Module()
    m.conv = tnn.Conv2d(cout, cout, 3, 1, 1)
    m.forward = lambda x: m.conv(
        tnn.functional.interpolate(x, scale_factor=2, mode='nearest'))
    return m


class TorchUNet2DCondition(tnn.Module):
    """Tiny diffusers-schema UNet2DConditionModel twin."""

    def __init__(self, in_ch=8, out_ch=4, block_out=(32, 64),
                 layers_per_block=1, heads=(1, 2),
                 cross_attn=(True, False), ctx=16, linear_proj=True):
        super().__init__()
        lp = linear_proj
        self.block_out, self.lpb = block_out, layers_per_block
        self.cross = cross_attn
        temb = block_out[0] * 4
        self.conv_in = tnn.Conv2d(in_ch, block_out[0], 3, 1, 1)
        self.time_embedding = tnn.Module()
        self.time_embedding.linear_1 = tnn.Linear(block_out[0], temb)
        self.time_embedding.linear_2 = tnn.Linear(temb, temb)
        n = len(block_out)
        self.down_blocks = tnn.ModuleList()
        ch = block_out[0]
        for i, c in enumerate(block_out):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TLDMResnet(ch if j == 0 else c, c, temb)
                 for j in range(layers_per_block)])
            if cross_attn[i]:
                blk.attentions = tnn.ModuleList(
                    [TLDMTransformer2D(c, heads[i], ctx,
                                       linear_proj=lp)
                     for _ in range(layers_per_block)])
            if i < n - 1:
                blk.downsamplers = tnn.ModuleList([_t_downsampler(c)])
            self.down_blocks.append(blk)
            ch = c
        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [TLDMResnet(ch, ch, temb), TLDMResnet(ch, ch, temb)])
        self.mid_block.attentions = tnn.ModuleList(
            [TLDMTransformer2D(ch, heads[-1], ctx, linear_proj=lp)])
        self.up_blocks = tnn.ModuleList()
        for k in range(n):
            i = n - 1 - k
            c = block_out[i]
            blk = tnn.Module()
            rs = []
            for j in range(layers_per_block + 1):
                # skip channels: reverse order of what was pushed
                skip_c = self._skip_ch(i, j)
                rs.append(TLDMResnet(ch + skip_c, c, temb))
                ch = c
            blk.resnets = tnn.ModuleList(rs)
            if cross_attn[i]:
                blk.attentions = tnn.ModuleList(
                    [TLDMTransformer2D(c, heads[i], ctx,
                                       linear_proj=lp)
                     for _ in range(layers_per_block + 1)])
            if i > 0:
                blk.upsamplers = tnn.ModuleList([_t_upsampler(c)])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(32, block_out[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(block_out[0], out_ch, 3, 1, 1)

    def _skip_ch(self, i, j):
        """Channel width of the skip popped at up level i, slot j."""
        bo, lpb = self.block_out, self.lpb
        n = len(bo)
        # stack: [conv_in] + per level: lpb outputs + (downsample out)
        stack = [bo[0]]
        for ii, c in enumerate(bo):
            stack += [c] * lpb
            if ii < n - 1:
                stack.append(c)
        # pops happen deepest level first
        idx = sum(lpb + 1 for _ in range(n - 1 - i)) + j
        return stack[-(idx + 1)]

    def forward(self, x, t, context):
        half = self.block_out[0] // 2
        freqs = torch.exp(
            -_math.log(10000.0) * torch.arange(half, dtype=torch.float32)
            / half)
        emb = t.float()[:, None] * freqs[None]
        emb = torch.cat([emb.cos(), emb.sin()], dim=-1)
        temb = self.time_embedding.linear_2(tnn.functional.silu(
            self.time_embedding.linear_1(emb)))
        h = self.conv_in(x)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if hasattr(blk, 'attentions'):
                    h = blk.attentions[j](h, context)
                skips.append(h)
            if hasattr(blk, 'downsamplers'):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = r(h, temb)
                if hasattr(blk, 'attentions'):
                    h = blk.attentions[j](h, context)
            if hasattr(blk, 'upsamplers'):
                h = blk.upsamplers[0](h)
        h = tnn.functional.silu(self.conv_norm_out(h))
        return self.conv_out(h)


class TLDMVAEAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.Sequential(tnn.Linear(ch, ch), tnn.Dropout(0.0))

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        a = (q @ k.transpose(-1, -2)) / _math.sqrt(C)
        out = self.to_out(a.softmax(-1) @ v)
        return x + out.reshape(B, H, W, C).permute(0, 3, 1, 2)


class TorchAutoencoderKL(tnn.Module):
    """Tiny diffusers-schema AutoencoderKL twin (encoder+decoder)."""

    def __init__(self, block_out=(32, 64), layers_per_block=1,
                 latent_ch=4, img_ch=3):
        super().__init__()
        n = len(block_out)
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(img_ch, block_out[0], 3, 1, 1)
        enc.down_blocks = tnn.ModuleList()
        ch = block_out[0]
        for i, c in enumerate(block_out):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TLDMResnet(ch if j == 0 else c, c, None, eps=1e-6)
                 for j in range(layers_per_block)])
            if i < n - 1:
                blk.downsamplers = tnn.ModuleList(
                    [_t_downsampler(c, vae=True)])
            enc.down_blocks.append(blk)
            ch = c
        enc.mid_block = tnn.Module()
        enc.mid_block.resnets = tnn.ModuleList(
            [TLDMResnet(ch, ch, None, eps=1e-6),
             TLDMResnet(ch, ch, None, eps=1e-6)])
        enc.mid_block.attentions = tnn.ModuleList([TLDMVAEAttn(ch)])
        enc.conv_norm_out = tnn.GroupNorm(32, ch, eps=1e-6)
        enc.conv_out = tnn.Conv2d(ch, 2 * latent_ch, 3, 1, 1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * latent_ch, 2 * latent_ch, 1)
        self.post_quant_conv = tnn.Conv2d(latent_ch, latent_ch, 1)
        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(latent_ch, block_out[-1], 3, 1, 1)
        dec.mid_block = tnn.Module()
        dec.mid_block.resnets = tnn.ModuleList(
            [TLDMResnet(block_out[-1], block_out[-1], None, eps=1e-6),
             TLDMResnet(block_out[-1], block_out[-1], None, eps=1e-6)])
        dec.mid_block.attentions = tnn.ModuleList(
            [TLDMVAEAttn(block_out[-1])])
        dec.up_blocks = tnn.ModuleList()
        ch = block_out[-1]
        for k in range(n):
            c = list(reversed(block_out))[k]
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TLDMResnet(ch if j == 0 else c, c, None, eps=1e-6)
                 for j in range(layers_per_block + 1)])
            if k < n - 1:
                blk.upsamplers = tnn.ModuleList([_t_upsampler(c)])
            dec.up_blocks.append(blk)
            ch = c
        dec.conv_norm_out = tnn.GroupNorm(32, block_out[0], eps=1e-6)
        dec.conv_out = tnn.Conv2d(block_out[0], img_ch, 3, 1, 1)
        self.decoder = dec

    def encode(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, 'downsamplers'):
                h = blk.downsamplers[0](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(tnn.functional.silu(e.conv_norm_out(h)))
        return self.quant_conv(h).chunk(2, dim=1)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, 'upsamplers'):
                h = blk.upsamplers[0](h)
        return d.conv_out(tnn.functional.silu(d.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# SAM (segment-anything) twin — official sam_vit_* checkpoint schema.
# Independent transcription of the architecture (the package is not in
# this image); used to exercise models/sam.py::convert_sam end to end.
# ---------------------------------------------------------------------------

class TSamLayerNorm2d(tnn.Module):
    def __init__(self, ch, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(ch))
        self.bias = tnn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):                       # (B, C, H, W)
        mu = x.mean(1, keepdim=True)
        var = ((x - mu) ** 2).mean(1, keepdim=True)
        x = (x - mu) / torch.sqrt(var + self.eps)
        return x * self.weight[:, None, None] + self.bias[:, None, None]


class _TSamEncAttn(tnn.Module):
    def __init__(self, dim, heads, size):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.scale = hd ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.rel_pos_h = tnn.Parameter(torch.zeros(2 * size - 1, hd))
        self.rel_pos_w = tnn.Parameter(torch.zeros(2 * size - 1, hd))

    def forward(self, x):                       # (B, H, W, C)
        B, H, W, C = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.heads, -1) \
            .permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, B * self.heads, H * W, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        # decomposed relative positions
        ch = q.shape[-1]
        idx_h = (torch.arange(H)[:, None] - torch.arange(H)[None, :]
                 + H - 1)
        idx_w = (torch.arange(W)[:, None] - torch.arange(W)[None, :]
                 + W - 1)
        Rh, Rw = self.rel_pos_h[idx_h], self.rel_pos_w[idx_w]
        rq = q.reshape(B * self.heads, H, W, ch)
        rel_h = torch.einsum('bhwc,hkc->bhwk', rq, Rh)
        rel_w = torch.einsum('bhwc,wkc->bhwk', rq, Rw)
        attn = (attn.view(B * self.heads, H, W, H, W)
                + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
                ).view(B * self.heads, H * W, H * W)
        attn = attn.softmax(-1)
        x = (attn @ v).view(B, self.heads, H, W, -1) \
            .permute(0, 2, 3, 1, 4).reshape(B, H, W, C)
        return self.proj(x)


class _TSamMLP(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.lin1 = tnn.Linear(dim, hidden)
        self.lin2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.lin2(tnn.functional.gelu(self.lin1(x)))


class _TSamBlock(tnn.Module):
    def __init__(self, dim, heads, window, grid):
        super().__init__()
        self.window = window
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _TSamEncAttn(dim, heads,
                                 window if window > 0 else grid)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TSamMLP(dim, dim * 4)

    def forward(self, x):                       # (B, H, W, C)
        sc = x
        x = self.norm1(x)
        if self.window > 0:
            B, H, W, C = x.shape
            w = self.window
            ph, pw = (-H) % w, (-W) % w
            x = tnn.functional.pad(x, (0, 0, 0, pw, 0, ph))
            Hp, Wp = H + ph, W + pw
            x = x.view(B, Hp // w, w, Wp // w, w, C) \
                .permute(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C)
            x = self.attn(x)
            x = x.view(B, Hp // w, Wp // w, w, w, C) \
                .permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            x = x[:, :H, :W]
        else:
            x = self.attn(x)
        x = sc + x
        return x + self.mlp(self.norm2(x))


class _TSamEncoder(tnn.Module):
    def __init__(self, img_size, patch, dim, depth, heads, window,
                 global_idx, out_ch):
        super().__init__()
        g = img_size // patch
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.pos_embed = tnn.Parameter(torch.zeros(1, g, g, dim))
        self.blocks = tnn.ModuleList(
            [_TSamBlock(dim, heads,
                        0 if i in global_idx else window, g)
             for i in range(depth)])
        self.neck = tnn.Sequential(
            tnn.Conv2d(dim, out_ch, 1, bias=False),
            TSamLayerNorm2d(out_ch),
            tnn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False),
            TSamLayerNorm2d(out_ch))

    def forward(self, x):                       # (B, 3, S, S)
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))  # (B, D, G, G)


class _TSamPromptEncoder(tnn.Module):
    def __init__(self, dim, grid, input_size):
        super().__init__()
        self.grid, self.input_size = grid, input_size
        self.pe_layer = tnn.Module()
        self.pe_layer.register_buffer(
            'positional_encoding_gaussian_matrix',
            torch.randn(2, dim // 2))
        self.point_embeddings = tnn.ModuleList(
            [tnn.Embedding(1, dim) for _ in range(4)])
        self.not_a_point_embed = tnn.Embedding(1, dim)
        self.no_mask_embed = tnn.Embedding(1, dim)
        # mask-input branch kept for checkpoint-schema completeness
        self.mask_downscaling = tnn.Sequential(
            tnn.Conv2d(1, 4, 2, 2), TSamLayerNorm2d(4), tnn.GELU(),
            tnn.Conv2d(4, 16, 2, 2), TSamLayerNorm2d(16), tnn.GELU(),
            tnn.Conv2d(16, dim, 1))

    def _pe(self, coords01):
        g = self.pe_layer.positional_encoding_gaussian_matrix
        c = (2 * coords01 - 1) @ g
        c = 2 * _math.pi * c
        return torch.cat([torch.sin(c), torch.cos(c)], -1)

    def dense_pe(self):
        g = self.grid
        ys = (torch.arange(g, dtype=torch.float32) + 0.5) / g
        xs = (torch.arange(g, dtype=torch.float32) + 0.5) / g
        gy, gx = torch.meshgrid(ys, xs, indexing='ij')
        return self._pe(torch.stack([gx, gy], -1))   # (G, G, D)

    def forward(self, boxes):                   # (K, 4) xyxy pixels
        pts = boxes.reshape(-1, 2, 2) + 0.5
        emb = self._pe(pts / self.input_size)
        emb = emb + torch.stack(
            [self.point_embeddings[2].weight[0],
             self.point_embeddings[3].weight[0]])[None]
        dense = self.no_mask_embed.weight[0].view(1, -1, 1, 1) \
            .expand(1, -1, self.grid, self.grid)
        return emb, dense


class _TTwoWayAttn(tnn.Module):
    def __init__(self, dim, heads, downsample=1):
        super().__init__()
        d = dim // downsample
        self.heads = heads
        self.q_proj = tnn.Linear(dim, d)
        self.k_proj = tnn.Linear(dim, d)
        self.v_proj = tnn.Linear(dim, d)
        self.out_proj = tnn.Linear(d, dim)

    def forward(self, q, k, v):
        B = q.shape[0]

        def sp(x):
            return x.view(B, -1, self.heads,
                          x.shape[-1] // self.heads).transpose(1, 2)
        qh, kh, vh = sp(self.q_proj(q)), sp(self.k_proj(k)), \
            sp(self.v_proj(v))
        attn = (qh @ kh.transpose(-2, -1)) / _math.sqrt(qh.shape[-1])
        out = (attn.softmax(-1) @ vh).transpose(1, 2).flatten(2)
        return self.out_proj(out)


class _TTwoWayBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_pe):
        super().__init__()
        self.skip_pe = skip_pe
        self.self_attn = _TTwoWayAttn(dim, heads)
        self.norm1 = tnn.LayerNorm(dim)
        self.cross_attn_token_to_image = _TTwoWayAttn(dim, heads, 2)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = _TSamMLP(dim, mlp_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.cross_attn_image_to_token = _TTwoWayAttn(dim, heads, 2)
        self.norm4 = tnn.LayerNorm(dim)

    def forward(self, queries, keys, qpe, kpe):
        if self.skip_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q, k = queries + qpe, keys + kpe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(queries + self.mlp(queries))
        q = queries + qpe
        keys = self.norm4(
            keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class _TTwoWayTransformer(tnn.Module):
    def __init__(self, dim, heads, mlp_dim, depth=2):
        super().__init__()
        self.layers = tnn.ModuleList(
            [_TTwoWayBlock(dim, heads, mlp_dim, i == 0)
             for i in range(depth)])
        self.final_attn_token_to_image = _TTwoWayAttn(dim, heads, 2)
        self.norm_final_attn = tnn.LayerNorm(dim)

    def forward(self, image_emb, image_pe, tokens):
        queries, keys = tokens, image_emb
        for lyr in self.layers:
            queries, keys = lyr(queries, keys, tokens, image_pe)
        q, k = queries + tokens, keys + image_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class _TSamMLP3(tnn.Module):
    def __init__(self, dim, hidden, out):
        super().__init__()
        self.layers = tnn.ModuleList(
            [tnn.Linear(dim, hidden), tnn.Linear(hidden, hidden),
             tnn.Linear(hidden, out)])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x)
            if i < 2:
                x = tnn.functional.relu(x)
        return x


class _TSamMaskDecoder(tnn.Module):
    def __init__(self, dim, heads, mlp_dim, num_multimask=3):
        super().__init__()
        nm = num_multimask + 1
        self.transformer = _TTwoWayTransformer(dim, heads, mlp_dim)
        self.iou_token = tnn.Embedding(1, dim)
        self.mask_tokens = tnn.Embedding(nm, dim)
        self.output_upscaling = tnn.Sequential(
            tnn.ConvTranspose2d(dim, dim // 4, 2, 2),
            TSamLayerNorm2d(dim // 4), tnn.GELU(),
            tnn.ConvTranspose2d(dim // 4, dim // 8, 2, 2), tnn.GELU())
        self.output_hypernetworks_mlps = tnn.ModuleList(
            [_TSamMLP3(dim, dim, dim // 8) for _ in range(nm)])
        self.iou_prediction_head = _TSamMLP3(dim, dim, nm)

    def forward(self, image_emb, image_pe, sparse, dense):
        # image_emb (D, G, G); sparse (K, T, D); dense (1, D, G, G)
        K = sparse.shape[0]
        out_tok = torch.cat([self.iou_token.weight,
                             self.mask_tokens.weight])
        tokens = torch.cat(
            [out_tok.unsqueeze(0).expand(K, -1, -1), sparse], 1)
        src = (image_emb.unsqueeze(0) + dense).flatten(2) \
            .transpose(1, 2).expand(K, -1, -1)
        pos = image_pe.permute(2, 0, 1).flatten(1).transpose(0, 1) \
            .unsqueeze(0).expand(K, -1, -1)
        hs, src = self.transformer(src, pos, tokens)
        nm = self.mask_tokens.weight.shape[0]
        iou_out, mask_out = hs[:, 0], hs[:, 1:1 + nm]
        G = image_emb.shape[-1]
        up = self.output_upscaling(
            src.transpose(1, 2).view(K, -1, G, G))
        hyper = torch.stack(
            [m(mask_out[:, i]) for i, m in
             enumerate(self.output_hypernetworks_mlps)], 1)
        masks = torch.einsum('knc,kchw->knhw', hyper, up)
        return masks, self.iou_prediction_head(iou_out)


class TorchSAM(tnn.Module):
    """Key-schema twin of the official `segment_anything` Sam."""

    def __init__(self, img_size=1024, patch=16, enc_dim=768,
                 enc_depth=12, enc_heads=12, window=14,
                 global_idx=(2, 5, 8, 11), dec_dim=256, dec_heads=8,
                 dec_mlp=2048):
        super().__init__()
        self.image_encoder = _TSamEncoder(
            img_size, patch, enc_dim, enc_depth, enc_heads, window,
            global_idx, dec_dim)
        self.prompt_encoder = _TSamPromptEncoder(
            dec_dim, img_size // patch, img_size)
        self.mask_decoder = _TSamMaskDecoder(dec_dim, dec_heads,
                                             dec_mlp)

    def forward(self, img, boxes, multimask=True):
        emb = self.image_encoder(img)[0]            # (D, G, G)
        sparse, dense = self.prompt_encoder(boxes)
        pe = self.prompt_encoder.dense_pe()
        masks, iou = self.mask_decoder(emb, pe, sparse, dense)
        if multimask:
            masks, iou = masks[:, 1:], iou[:, 1:]
        else:
            masks, iou = masks[:, :1], iou[:, :1]
        best = iou.argmax(-1)
        sel = masks[torch.arange(masks.shape[0]), best]
        return sel, iou.max(-1).values


# ---------------------------------------------------------------------------
# Mask R-CNN twin — torchvision maskrcnn_resnet50_fpn key schema
# (neural parts: frozen-BN ResNet50, FPN, RPN head, box/mask heads;
# the proposal machinery is tested against numpy oracles instead).
# ---------------------------------------------------------------------------

class TFrozenBN(tnn.Module):
    def __init__(self, ch, eps=1e-5):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(ch))
        self.bias = tnn.Parameter(torch.zeros(ch))
        self.register_buffer('running_mean', torch.zeros(ch))
        self.register_buffer('running_var', torch.ones(ch))
        self.eps = eps

    def forward(self, x):
        s = (self.weight / torch.sqrt(self.running_var + self.eps)
             )[:, None, None]
        return x * s + (self.bias[:, None, None]
                        - self.running_mean[:, None, None] * s)


class _TBottleneck(tnn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = TFrozenBN(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = TFrozenBN(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = TFrozenBN(width * 4)
        if stride != 1 or cin != width * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                TFrozenBN(width * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        x = tF.relu(self.bn1(self.conv1(x)))
        x = tF.relu(self.bn2(self.conv2(x)))
        return tF.relu(self.bn3(self.conv3(x)) + idn)


class _TResNet50Body(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = TFrozenBN(64)
        cin = 64
        for li, (n, w) in enumerate(zip((3, 4, 6, 3),
                                        (64, 128, 256, 512))):
            blocks = []
            for bi in range(n):
                blocks.append(_TBottleneck(
                    cin, w, 2 if (bi == 0 and li > 0) else 1))
                cin = w * 4
            setattr(self, f'layer{li + 1}', tnn.Sequential(*blocks))

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        x = tF.max_pool2d(x, 3, 2, 1)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class _TFPN(tnn.Module):
    def __init__(self, chans=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.inner_blocks = tnn.ModuleList(
            [tnn.Conv2d(c, out, 1) for c in chans])
        self.layer_blocks = tnn.ModuleList(
            [tnn.Conv2d(out, out, 3, padding=1) for _ in chans])

    def forward(self, feats):
        inners = [m(f) for m, f in zip(self.inner_blocks, feats)]
        last = inners[-1]
        outs = [None] * 4
        outs[-1] = self.layer_blocks[-1](last)
        for i in (2, 1, 0):
            last = inners[i] + tF.interpolate(
                last, size=inners[i].shape[-2:], mode='nearest')
            outs[i] = self.layer_blocks[i](last)
        outs.append(tF.max_pool2d(outs[-1], 1, 2, 0))
        return outs


class _TRPNHead(tnn.Module):
    def __init__(self, ch=256, a=3):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)
        self.cls_logits = tnn.Conv2d(ch, a, 1)
        self.bbox_pred = tnn.Conv2d(ch, a * 4, 1)

    def forward(self, feats):
        out = []
        for f in feats:
            h = tF.relu(self.conv(f))
            out.append((self.cls_logits(h), self.bbox_pred(h)))
        return out


class _TBoxHead(tnn.Module):
    def __init__(self, ch=256, classes=91):
        super().__init__()
        self.fc6 = tnn.Linear(ch * 49, 1024)
        self.fc7 = tnn.Linear(1024, 1024)
        self.cls_score = tnn.Linear(1024, classes)
        self.bbox_pred = tnn.Linear(1024, classes * 4)

    def forward(self, roi):                     # (N, 256, 7, 7)
        x = tF.relu(self.fc6(roi.flatten(1)))
        x = tF.relu(self.fc7(x))
        return self.cls_score(x), self.bbox_pred(x)


class _TMaskHead(tnn.Module):
    def __init__(self, ch=256, classes=91):
        super().__init__()
        for i in range(1, 5):
            setattr(self, f'mask_fcn{i}',
                    tnn.Conv2d(ch, ch, 3, padding=1))
        self.conv5_mask = tnn.ConvTranspose2d(ch, ch, 2, 2)
        self.mask_fcn_logits = tnn.Conv2d(ch, classes, 1)

    def forward(self, roi):                     # (N, 256, 14, 14)
        x = roi
        for i in range(1, 5):
            x = tF.relu(getattr(self, f'mask_fcn{i}')(x))
        x = tF.relu(self.conv5_mask(x))
        return self.mask_fcn_logits(x)


class TorchMaskRCNNNets(tnn.Module):
    """Checkpoint-schema twin of the torchvision Mask R-CNN NETWORKS
    (the data-flow around them — anchors, RoIAlign, NMS, pasting — is
    pinned by numpy oracles in tests/test_maskrcnn.py)."""

    def __init__(self):
        super().__init__()
        self.backbone = tnn.Module()
        self.backbone.body = _TResNet50Body()
        self.backbone.fpn = _TFPN()
        self.rpn = tnn.Module()
        self.rpn.head = _TRPNHead()
        self.roi_heads = tnn.Module()
        full = _TBoxHead()
        self.roi_heads.box_head = tnn.Module()
        self.roi_heads.box_head.fc6 = full.fc6
        self.roi_heads.box_head.fc7 = full.fc7
        self.roi_heads.box_predictor = tnn.Module()
        self.roi_heads.box_predictor.cls_score = full.cls_score
        self.roi_heads.box_predictor.bbox_pred = full.bbox_pred
        mh = _TMaskHead()
        self.roi_heads.mask_head = tnn.Module()
        for i in range(1, 5):
            setattr(self.roi_heads.mask_head, f'mask_fcn{i}',
                    getattr(mh, f'mask_fcn{i}'))
        self.roi_heads.mask_predictor = tnn.Module()
        self.roi_heads.mask_predictor.conv5_mask = mh.conv5_mask
        self.roi_heads.mask_predictor.mask_fcn_logits = \
            mh.mask_fcn_logits

    def features(self, x):
        return self.backbone.fpn(self.backbone.body(x))

    def rpn_outputs(self, feats):
        return self.rpn.head(feats)

    def box_outputs(self, roi):                  # (N, 256, 7, 7)
        rh = self.roi_heads
        x = tF.relu(rh.box_head.fc6(roi.flatten(1)))
        x = tF.relu(rh.box_head.fc7(x))
        return (rh.box_predictor.cls_score(x),
                rh.box_predictor.bbox_pred(x))

    def mask_outputs(self, roi):                 # (N, 256, 14, 14)
        rh = self.roi_heads
        x = roi
        for i in range(1, 5):
            x = tF.relu(getattr(rh.mask_head, f'mask_fcn{i}')(x))
        x = tF.relu(rh.mask_predictor.conv5_mask(x))
        return rh.mask_predictor.mask_fcn_logits(x)


# -- anime-segmentation refine nets: ISNet GT encoder + MODNet --------
#    (checkpoint schema: animeseg_refine/isnet.py REBNCONV conv_s1/
#    bn_s1 + myrebnconv conv/bn; modnet.py branch/Sequential names)

def _t_up_like(src, tar):
    return tnn.functional.interpolate(
        src, size=tar.shape[2:], mode='bilinear', align_corners=False)


class TREBN(tnn.Module):
    def __init__(self, cin, cout, dirate=1):
        super().__init__()
        self.conv_s1 = tnn.Conv2d(cin, cout, 3, padding=dirate,
                                  dilation=dirate)
        self.bn_s1 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn_s1(self.conv_s1(x)))


class TRSU(tnn.Module):
    """RSU of any height; dilated=True is RSU4F / the u2net_refactor
    dilated stages (no pooling, rates 2^(i-1))."""

    def __init__(self, height, cin, mid, cout, dilated=False):
        super().__init__()
        self.height, self.dilated = height, dilated
        L = height

        def rate(i):
            return 2 ** (i - 1) if dilated else 1
        self.rebnconvin = TREBN(cin, cout)
        self.add_module('rebnconv1', TREBN(cout, mid, rate(1)))
        for i in range(2, L):
            self.add_module(f'rebnconv{i}', TREBN(mid, mid, rate(i)))
        self.add_module(f'rebnconv{L}',
                        TREBN(mid, mid, 2 ** (L - 1) if dilated else 2))
        for i in range(L - 1, 0, -1):
            self.add_module(f'rebnconv{i}d',
                            TREBN(2 * mid, cout if i == 1 else mid,
                                  rate(i)))
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        L = self.height
        hxin = self.rebnconvin(x)
        enc = [self.rebnconv1(hxin)]
        h = enc[0]
        for i in range(2, L):
            if not self.dilated:
                h = self.pool(h)
            h = getattr(self, f'rebnconv{i}')(h)
            enc.append(h)
        d = getattr(self, f'rebnconv{L}')(h)
        for i in range(L - 1, 0, -1):
            skip = enc[i - 1]
            if d.shape[2:] != skip.shape[2:]:
                d = _t_up_like(d, skip)
            d = getattr(self, f'rebnconv{i}d')(torch.cat([d, skip], 1))
        return d + hxin


class TMyREBN(tnn.Module):
    """myrebnconv: plain 'conv'/'bn' child names."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, stride, 1)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TorchISNetGT(tnn.Module):
    def __init__(self, in_ch=1, out_ch=1):
        super().__init__()
        self.conv_in = TMyREBN(in_ch, 16, stride=2)
        self.stage1 = TRSU(7, 16, 16, 64)
        self.stage2 = TRSU(6, 64, 16, 64)
        self.stage3 = TRSU(5, 64, 32, 128)
        self.stage4 = TRSU(4, 128, 32, 256)
        self.stage5 = TRSU(4, 256, 64, 512, dilated=True)
        self.stage6 = TRSU(4, 512, 64, 512, dilated=True)
        for i, c in enumerate((64, 64, 128, 256, 512, 512)):
            self.add_module(f'side{i + 1}',
                            tnn.Conv2d(c, out_ch, 3, padding=1))
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        h = self.conv_in(x)
        feats = []
        for i in range(1, 7):
            h = getattr(self, f'stage{i}')(h)
            feats.append(h)
            if i < 6:
                h = self.pool(h)
        sides = [_t_up_like(getattr(self, f'side{i + 1}')(f), x)
                 for i, f in enumerate(feats)]
        return sides, feats


class TIBNorm(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.bnorm = tnn.BatchNorm2d(c // 2)
        self.inorm = tnn.InstanceNorm2d(c - c // 2, affine=False)

    def forward(self, x):
        h = self.bnorm.num_features
        return torch.cat([self.bnorm(x[:, :h]), self.inorm(x[:, h:])], 1)


class TConvIBN(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0,
                 with_ibn=True, with_relu=True):
        super().__init__()
        layers = [tnn.Conv2d(cin, cout, k, stride, padding)]
        if with_ibn:
            layers.append(TIBNorm(cout))
        if with_relu:
            layers.append(tnn.ReLU())
        self.layers = tnn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class TIR(tnn.Module):
    def __init__(self, cin, cout, stride, t):
        super().__init__()
        hidden = round(cin * t)
        self.use_res = stride == 1 and cin == cout
        if t == 1:
            self.conv = tnn.Sequential(
                tnn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                           bias=False),
                tnn.BatchNorm2d(hidden), tnn.ReLU6(),
                tnn.Conv2d(hidden, cout, 1, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.conv = tnn.Sequential(
                tnn.Conv2d(cin, hidden, 1, bias=False),
                tnn.BatchNorm2d(hidden), tnn.ReLU6(),
                tnn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                           bias=False),
                tnn.BatchNorm2d(hidden), tnn.ReLU6(),
                tnn.Conv2d(hidden, cout, 1, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TMBV2(tnn.Module):
    def __init__(self, in_ch=3):
        super().__init__()
        feats = [tnn.Sequential(
            tnn.Conv2d(in_ch, 32, 3, 2, 1, bias=False),
            tnn.BatchNorm2d(32), tnn.ReLU6())]
        c_in = 32
        for t, c, n, s in ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                           (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                           (6, 320, 1, 1)):
            for i in range(n):
                feats.append(TIR(c_in, c, s if i == 0 else 1, t))
                c_in = c
        feats.append(tnn.Sequential(
            tnn.Conv2d(c_in, 1280, 1, bias=False),
            tnn.BatchNorm2d(1280), tnn.ReLU6()))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        out = []
        for i, f in enumerate(self.features):
            x = f(x)
            if i in (1, 3, 6, 13, 18):
                out.append(x)
        return out  # enc2x, enc4x, enc8x, enc16x, enc32x


def _t_up2(x):
    return tnn.functional.interpolate(
        x, scale_factor=2, mode='bilinear', align_corners=False)


def _t_down(x, f):
    return tnn.functional.interpolate(
        x, scale_factor=1 / f, mode='bilinear', align_corners=False)


class TorchMODNet(tnn.Module):
    """Inference-path MODNet twin with the reference checkpoint layout
    (incl. the shared backbone registered under both 'backbone.' and
    'lr_branch.backbone.')."""

    def __init__(self, hr=32):
        super().__init__()
        backbone = tnn.Module()
        backbone.model = TMBV2()
        self.backbone = backbone
        lr = tnn.Module()
        lr.backbone = backbone
        se = tnn.Module()
        se.fc = tnn.Sequential(tnn.Linear(1280, 320, bias=False),
                               tnn.ReLU(),
                               tnn.Linear(320, 1280, bias=False),
                               tnn.Sigmoid())
        lr.se_block = se
        lr.conv_lr16x = TConvIBN(1280, 96, 5, 1, 2)
        lr.conv_lr8x = TConvIBN(96, 32, 5, 1, 2)
        lr.conv_lr = TConvIBN(32, 1, 3, 2, 1, with_ibn=False,
                              with_relu=False)
        self.lr_branch = lr
        h = tnn.Module()
        h.tohr_enc2x = TConvIBN(16, hr, 1)
        h.conv_enc2x = TConvIBN(hr + 3, hr, 3, 2, 1)
        h.tohr_enc4x = TConvIBN(24, hr, 1)
        h.conv_enc4x = TConvIBN(2 * hr, 2 * hr, 3, 1, 1)
        h.conv_hr4x = tnn.Sequential(
            TConvIBN(3 * hr + 3, 2 * hr, 3, 1, 1),
            TConvIBN(2 * hr, 2 * hr, 3, 1, 1),
            TConvIBN(2 * hr, hr, 3, 1, 1))
        h.conv_hr2x = tnn.Sequential(
            TConvIBN(2 * hr, 2 * hr, 3, 1, 1),
            TConvIBN(2 * hr, hr, 3, 1, 1),
            TConvIBN(hr, hr, 3, 1, 1), TConvIBN(hr, hr, 3, 1, 1))
        h.conv_hr = tnn.Sequential(
            TConvIBN(hr + 3, hr, 3, 1, 1),
            TConvIBN(hr, 1, 1, with_ibn=False, with_relu=False))
        self.hr_branch = h
        f = tnn.Module()
        f.conv_lr4x = TConvIBN(32, hr, 5, 1, 2)
        f.conv_f2x = TConvIBN(2 * hr, hr, 3, 1, 1)
        f.conv_f = tnn.Sequential(
            TConvIBN(hr + 3, hr // 2, 3, 1, 1),
            TConvIBN(hr // 2, 1, 1, with_ibn=False, with_relu=False))
        self.f_branch = f

    def forward(self, img):
        enc2x, enc4x, _, _, enc32x = self.backbone.model(img)
        w = enc32x.mean((2, 3))
        w = self.lr_branch.se_block.fc(w)
        e32 = enc32x * w[:, :, None, None]
        lr16x = self.lr_branch.conv_lr16x(_t_up2(e32))
        lr8x = self.lr_branch.conv_lr8x(_t_up2(lr16x))

        img2x, img4x = _t_down(img, 2), _t_down(img, 4)
        e2 = self.hr_branch.tohr_enc2x(enc2x)
        hr4x = self.hr_branch.conv_enc2x(torch.cat([img2x, e2], 1))
        e4 = self.hr_branch.tohr_enc4x(enc4x)
        hr4x = self.hr_branch.conv_enc4x(torch.cat([hr4x, e4], 1))
        hr4x = self.hr_branch.conv_hr4x(
            torch.cat([hr4x, _t_up2(lr8x), img4x], 1))
        hr2x = self.hr_branch.conv_hr2x(
            torch.cat([_t_up2(hr4x), e2], 1))

        lr4x = self.f_branch.conv_lr4x(_t_up2(lr8x))
        f2x = self.f_branch.conv_f2x(
            torch.cat([_t_up2(lr4x), hr2x], 1))
        f = self.f_branch.conv_f(torch.cat([_t_up2(f2x), img], 1))
        return torch.sigmoid(f)
