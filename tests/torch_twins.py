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
