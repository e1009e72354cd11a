#!/usr/bin/env python
"""Build the committed notebook frontends (executed WITH outputs).

The reference ships two notebooks (Parity:
/root/reference/run_segmentation.ipynb — a 3-cell segmentation demo
committed with its cell outputs, the project's de-facto acceptance
artifact — and /root/reference/run_in_colab.ipynb — a setup/deploy
walkthrough). This script writes the TPU-native analogues into
notebooks/:

- run_segmentation.ipynb : executed here, cell outputs (instance
  overlay, Ken Burns stage previews, rendered frames) embedded as
  PNGs. Re-run it in jupyter after installing checkpoints for real
  masks; committed outputs use the seeded random init.
- run_in_colab.ipynb     : environment setup walkthrough (static —
  the reference's is a pip/cmake transcript, not a computation).

Execution here is on the CPU backend for byte-stable artifacts; in
jupyter the cells run on whatever backend jax selects (TPU when
available). The notebook cells use plain IPython display idiom; this
generator fakes `IPython.display` to capture the images when IPython
is not importable in this environment.
"""
import io
import json
import os.path as osp
import sys
import types
from contextlib import redirect_stdout

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = osp.join(REPO, 'notebooks')


def md(src):
    return {'cell_type': 'markdown', 'metadata': {},
            'source': src.splitlines(keepends=True)}


def code(src):
    return {'cell_type': 'code', 'metadata': {}, 'execution_count': None,
            'outputs': [], 'source': src.splitlines(keepends=True)}


SEG_CELLS = [
    md("""# Anime instance segmentation + 3D Ken Burns — TPU-native demo

The `cartoonsegmentation_tpu` analogue of the reference's
`run_segmentation.ipynb`: detect anime instances, refine their masks,
then run the full Ken Burns pipeline stages on the same image.

**Committed outputs use the deterministically-seeded RANDOM weight
init** (no published checkpoints ship with this environment), so the
overlays show pipeline *structure*, not model quality — point `ckpt`
at a converted checkpoint for real masks. Runs on TPU when available,
CPU otherwise; the first call compiles the XLA programs (seconds on
CPU, longer through a TPU tunnel)."""),
    code('''import cv2
import numpy as np
from IPython.display import Image, display

def show(img_bgr):
    """inline-display a BGR uint8 image"""
    ok, png = cv2.imencode('.png', img_bgr)
    display(Image(data=png.tobytes()))
'''),
    code('''import os.path as osp
from cartoonsegmentation_tpu.pipeline import AnimeInsSeg

# torch checkpoint (converted on load); random seeded init if absent
ckpt = 'models/AnimeInstanceSegmentation/rtmdetl_e60.ckpt'

mask_thres = 0.3
instance_thres = 0.3

net = AnimeInsSeg(det_size=320, mask_thr=mask_thres, max_instances=16)
if osp.exists(ckpt):
    net.load_torch_checkpoint(ckpt)
net.set_refine_method('refinenet_isnet', refine_size=160)

img_path = '/root/reference/examples/612989.jpg'  # point at your image
img = cv2.imread(img_path)
instances = net.infer(img, pred_score_thr=instance_thres)
print(f'{int(instances.count())} instance(s) above '
      f'score {instance_thres}')
'''),
    code('''# instances.bboxes/masks/scores are fixed-capacity device arrays;
# draw() composes the per-instance color overlay host-side
drawed = instances.draw(img, draw_bbox=True)
show(drawed)
'''),
    md("""## Ken Burns pipeline stages

`generate_state` runs detector → depth estimate → instance depth
adjustment → refinement → point cloud in one pass and records a
preview of every stage (the Web UI steps through the same dict)."""),
    code('''from cartoonsegmentation_tpu.config import KenBurnsConfig
from cartoonsegmentation_tpu.pipeline import KenBurnsPipeline

cfg = KenBurnsConfig(
    detector='animeinsseg', det_size=320, max_instances=16,
    refine_method='refinenet_isnet', refine_size=160,
    depth_est='default', max_size=224, num_frame=5,
    depth_field=True, auto_zoom=True)
pipe = KenBurnsPipeline(cfg)
pipe.ensure_detector()

state = pipe.generate_state(img)
for name in ('depth_coarse', 'depth_adjusted', 'depth_final',
             'instances'):
    print(name)
    show(pipe.stages[name])
'''),
    code('''# autozoom picks the to-crop; render three scrub positions with
# depth-of-field (the full clip: scripts/run_kenburns.py writes mp4)
obj_from, obj_to = pipe.autozoom(state)
frames = pipe.render_frames(state, obj_from, obj_to,
                            np.asarray([0.0, 0.5, 1.0], np.float32))
show(np.concatenate(list(np.asarray(frames)), axis=1))
'''),
]

COLAB_CELLS = [
    md("""# cartoonsegmentation_tpu — environment setup walkthrough

The analogue of the reference's `run_in_colab.ipynb` (a pip/cmake
deploy transcript). This framework is JAX/XLA-native: no CUDA,
mmcv/mmdet, or external PyPatchMatch checkout is needed."""),
    md('## 1. Project files'),
    code('!git clone <this-repo-url> cartoonsegmentation_tpu_repo\n'
         '%cd cartoonsegmentation_tpu_repo\n'),
    md("""## 2. Python libraries

Core: `jax` (with the TPU/your-accelerator runtime), `flax`, `optax`,
`numpy`, `opencv-python`. Optional: `torch` (CPU is enough — only the
checkpoint converters use it), `onnxruntime` (tagger onnx backend),
`requests` (style editing through a running sd-webui)."""),
    code('!pip install "jax[tpu]" flax optax einops numpy opencv-python\n'
         '!pip install torch --index-url '
         'https://download.pytorch.org/whl/cpu  # converters only\n'),
    md("""## 3. Models

Download the reference checkpoints; the converters load the torch
files directly (no torch runtime on the accelerator — weights are
converted to Flax on load):"""),
    code('!mkdir -p models\n'
         '!git clone https://huggingface.co/dreMaz/'
         'AnimeInstanceSegmentation models/AnimeInstanceSegmentation\n'),
    md("""## 4. Native PatchMatch (optional)

`inpaint_type: patchmatch` uses the self-contained in-repo C++ kernel
— built with plain cmake, no OpenCV dev headers:"""),
    code('!cmake -S csrc -B csrc/build -DCMAKE_BUILD_TYPE=Release\n'
         '!cmake --build csrc/build\n'),
    md("""## 5. Stable Diffusion Web UI (optional)

For `inpaint_type: ldm` / style editing, start any sd-webui with
`--api` and set `sd_img2img_url` in `configs/3dkenburns.yaml` to its
`/sdapi/v1/img2img` endpoint — or use `inpaint_type: ldm_native`
(in-process SD2 UNet/VAE, needs converted weights)."""),
    md('## 6. Run'),
    code('# browser UI (Ken Burns + segmentation + style tabs)\n'
         '!python scripts/naive_interface.py --port 8080\n'
         '\n'
         '# or one clip, image -> mp4\n'
         '!python scripts/run_kenburns.py '
         '--input-img examples/your_image.png --save-dir out/\n'),
]


def execute(cells):
    """Run code cells in a shared namespace, capturing print output
    and display(Image(...)) calls into notebook outputs."""
    captured = []

    class _Image:
        def __init__(self, data):
            self.data = data

    def _display(obj):
        captured.append(obj)

    fake = types.ModuleType('IPython.display')
    fake.Image, fake.display = _Image, _display
    pkg = types.ModuleType('IPython')
    pkg.display = fake
    saved = {k: sys.modules.get(k) for k in ('IPython', 'IPython.display')}
    sys.modules['IPython'], sys.modules['IPython.display'] = pkg, fake
    try:
        ns = {}
        for i, cell in enumerate(cells):
            if cell['cell_type'] != 'code':
                continue
            captured.clear()
            buf = io.StringIO()
            src = ''.join(cell['source'])
            with redirect_stdout(buf):
                exec(compile(src, f'<cell {i}>', 'exec'), ns)  # noqa: S102
            outs = []
            if buf.getvalue():
                outs.append({'output_type': 'stream', 'name': 'stdout',
                             'text': buf.getvalue().splitlines(
                                 keepends=True)})
            import base64
            for im in captured:
                outs.append({
                    'output_type': 'display_data', 'metadata': {},
                    'data': {'image/png': base64.b64encode(
                        im.data).decode()}})
            cell['outputs'] = outs
            cell['execution_count'] = i
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return cells


def notebook(cells):
    return {'cells': cells, 'metadata': {
        'kernelspec': {'display_name': 'Python 3', 'language': 'python',
                       'name': 'python3'},
        'language_info': {'name': 'python'}},
        'nbformat': 4, 'nbformat_minor': 5}


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import os
    os.makedirs(OUT_DIR, exist_ok=True)
    seg = notebook(execute([dict(c) for c in SEG_CELLS]))
    with open(osp.join(OUT_DIR, 'run_segmentation.ipynb'), 'w') as f:
        json.dump(seg, f, indent=1)
    with open(osp.join(OUT_DIR, 'run_in_colab.ipynb'), 'w') as f:
        json.dump(notebook(COLAB_CELLS), f, indent=1)
    n_img = sum(1 for c in seg['cells'] for o in c.get('outputs', [])
                if o.get('output_type') == 'display_data')
    print(f'wrote notebooks/ ({n_img} embedded images)')


if __name__ == '__main__':
    main()
