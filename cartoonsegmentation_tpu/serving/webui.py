"""Browser UI for the interactive server — the TPU-native stand-in
for the reference's gradio Web_UI (Web_UI/app.py + Components) and
naive_interface.html, with zero extra dependencies: one embedded
HTML/JS page served by the stdlib HTTP server (serving/interface.py).

Tabs:
- Ken Burns: upload → autozoom preview, live scrubber over /get_live,
  editable from/to crop boxes (/update_from, /update_to), result
  download (/get_result).
- Segmentation: upload → /segment returns detected instances (JSON)
  and a mask-overlay JPEG rendered server-side.
- Style: per-instance repaint through a running sd-webui server —
  upload + prompts → /style (the reference capability lives in
  Web_UI/Component_Style_Editing.py:1345-2219).
"""
from __future__ import annotations

PAGE_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>CartoonSegmentation TPU</title>
<style>
 body{font-family:sans-serif;margin:1.2em;background:#14161a;color:#e8e8e8}
 h1{font-size:1.2em} .tabs button{margin-right:.4em;padding:.4em 1em;
 background:#2a2e36;color:#e8e8e8;border:1px solid #444;cursor:pointer}
 .tabs button.on{background:#4a6fa5} .pane{display:none;margin-top:1em}
 .pane.on{display:block} img{max-width:100%;border:1px solid #333}
 input[type=number]{width:5em;background:#21242a;color:#eee;border:1px
 solid #444} label{margin-right:.7em} .row{margin:.6em 0}
 #status{color:#9ad;min-height:1.2em} pre{background:#1c1f24;
 padding:.6em;overflow:auto;max-height:14em}
 a{color:#8fc1ff}
</style></head><body>
<h1>CartoonSegmentation&nbsp;TPU</h1>
<div class="tabs">
 <button id="tb_kb" class="on" onclick="tab('kb')">Ken Burns</button>
 <button id="tb_seg" onclick="tab('seg')">Segmentation</button>
 <button id="tb_sty" onclick="tab('sty')">Style</button>
</div>
<div id="status"></div>

<div id="pane_kb" class="pane on">
 <div class="row"><input type="file" id="kb_file" accept="image/*">
  <button onclick="kbLoad()">Process</button>
  <label>depth <select id="cfg_depth">
   <option>leres</option><option>leres_boost</option>
   <option>zoe</option><option>zoe_nk</option>
   <option>default</option><option>marigold</option></select></label>
  <label>inpaint <select id="cfg_inpaint">
   <option>default</option><option>patchmatch</option>
   <option>ldm</option><option>ldm_native</option></select></label>
  <label>DoF <input type="checkbox" id="cfg_dof" checked></label>
  <button onclick="cfgApply()">apply config</button></div>
 <div class="row">
  t=<input type="range" id="kb_t" min="0" max="1" step="0.02" value="0"
     oninput="kbLive()">
  <a id="kb_dl" style="display:none" href="/get_result"
     download="kenburns.mp4">download video</a></div>
 <div class="row" id="kb_boxes" style="display:none">
  <b>from</b>
  <label>cx <input type="number" id="f_cx"></label>
  <label>cy <input type="number" id="f_cy"></label>
  <label>w <input type="number" id="f_w"></label>
  <label>h <input type="number" id="f_h"></label>
  <b>to</b>
  <label>cx <input type="number" id="t_cx"></label>
  <label>cy <input type="number" id="t_cy"></label>
  <label>w <input type="number" id="t_w"></label>
  <label>h <input type="number" id="t_h"></label>
  <button onclick="kbUpdate()">apply</button></div>
 <div class="row"><img id="kb_img"></div>
</div>

<div id="pane_seg" class="pane">
 <div class="row"><input type="file" id="seg_file" accept="image/*">
  <button onclick="segRun()">Detect</button></div>
 <div class="row"><img id="seg_img"></div>
 <pre id="seg_json"></pre>
</div>

<div id="pane_sty" class="pane">
 <div class="row"><input type="file" id="sty_file" accept="image/*">
  <button onclick="styRun()">Repaint</button></div>
 <div class="row">
  <label>style prompt <input id="sty_prompt" size="32"
    value="masterpiece, best quality"></label>
  <label>negative <input id="sty_nprompt" size="24"></label></div>
 <div class="row">
  <label>sd-webui url <input id="sty_url" size="40"
    value="http://127.0.0.1:7860/sdapi/v1/img2img"></label>
  <label>denoise <input type="number" id="sty_den" step="0.05"
    min="0" max="1" value="0.75"></label>
  <label>steps <input type="number" id="sty_steps" value="24"></label>
 </div>
 <div class="row"><img id="sty_img"></div>
</div>

<script>
function tab(k){for(const p of ['kb','seg','sty']){
  document.getElementById('pane_'+p).classList.toggle('on', p===k);
  document.getElementById('tb_'+p).classList.toggle('on', p===k);}}
function st(m){document.getElementById('status').textContent=m}
async function kbLoad(){
  const f=document.getElementById('kb_file').files[0];
  if(!f){st('choose an image first');return}
  st('processing (first run compiles kernels)...');
  const r=await fetch('/load_image',{method:'POST',body:f});
  const j=await r.json();
  if(j.error){st('error: '+j.error);return}
  st('loaded '+j.width+'x'+j.height);
  if(j.objFrom){
    document.getElementById('kb_boxes').style.display='block';
    const ids=[['f',j.objFrom],['t',j.objTo]];
    for(const [p,bx] of ids){
      document.getElementById(p+'_cx').value=bx.center_u;
      document.getElementById(p+'_cy').value=bx.center_v;
      document.getElementById(p+'_w').value=bx.crop_w;
      document.getElementById(p+'_h').value=bx.crop_h;}}
  document.getElementById('kb_dl').style.display='inline';
  kbLive();}
function kbLive(){
  const t=document.getElementById('kb_t').value;
  document.getElementById('kb_img').src='/get_live?fltTime='+t+
    '&_='+Date.now();}
async function cfgApply(){
  const body={depth_est:document.getElementById('cfg_depth').value,
    inpaint_type:document.getElementById('cfg_inpaint').value,
    depth_field:document.getElementById('cfg_dof').checked};
  const r=await fetch('/config',{method:'POST',
    body:JSON.stringify(body)});
  const j=await r.json();
  if(j.error){st('error: '+j.error);return}
  st('config applied ('+j.changed.join(', ')+') — reload the image');}
async function kbUpdate(){
  for(const [p,ep] of [['f','/update_from'],['t','/update_to']]){
    const box={center_u:+document.getElementById(p+'_cx').value,
      center_v:+document.getElementById(p+'_cy').value,
      crop_w:+document.getElementById(p+'_w').value,
      crop_h:+document.getElementById(p+'_h').value};
    await fetch(ep,{method:'POST',body:JSON.stringify(box)});}
  st('crop boxes updated'); kbLive();}
async function segRun(){
  const f=document.getElementById('seg_file').files[0];
  if(!f){st('choose an image first');return}
  st('detecting...');
  const r=await fetch('/segment',{method:'POST',body:f});
  const j=await r.json();
  if(j.error){st('error: '+j.error);return}
  st(j.instances.length+' instance(s)');
  document.getElementById('seg_json').textContent=
    JSON.stringify(j.instances,null,1);
  document.getElementById('seg_img').src=
    'data:image/jpeg;base64,'+j.overlay;}
function b64(file){return new Promise(res=>{const r=new FileReader();
  r.onload=()=>res(r.result.split(',')[1]);r.readAsDataURL(file);})}
async function styRun(){
  const f=document.getElementById('sty_file').files[0];
  if(!f){st('choose an image first');return}
  st('repainting (needs a running sd-webui)...');
  const payload={image:await b64(f),
    style_prompt:document.getElementById('sty_prompt').value,
    global_nprompt:document.getElementById('sty_nprompt').value,
    url:document.getElementById('sty_url').value,
    denoising_strength:+document.getElementById('sty_den').value,
    steps:+document.getElementById('sty_steps').value};
  const r=await fetch('/style',{method:'POST',
    body:JSON.stringify(payload)});
  const j=await r.json();
  if(j.error){st('error: '+j.error);return}
  if(!j.image){st(j.note||'no output');return}
  st('repainted ('+j.outputs+' output[s])');
  document.getElementById('sty_img').src=
    'data:image/png;base64,'+j.image;}
</script></body></html>
"""
