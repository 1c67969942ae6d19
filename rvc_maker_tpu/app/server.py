"""Web UI — a dependency-free replacement for the reference Gradio app.

The reference serves a 3,078-line Gradio Blocks app (app/app.py) whose
core tabs are conversion, effects, model info/fusion and training
monitoring.  Gradio is not in this image, so this is a small stdlib
http.server app exposing the same operations: a single-page UI plus a
JSON API (audio as base64 WAV).  Unlike the reference (which shells out
to subprocesses per action, app.py:839), pipelines are called in-process
and models stay loaded between requests.

Run:  python -m rvc_maker_tpu.app.server --port 7865
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..utils.i18n import tr

logger = logging.getLogger(__name__)

_STATE: dict = {"pipeline": None, "pipeline_key": None}
_LOCK = threading.Lock()
_JOBS: dict = {}          # id -> {"thread", "log", "done", "error"}
_JOBS_LOCK = threading.Lock()

INDEX_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>rvc_maker_tpu</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:60rem}
 fieldset{margin-bottom:1.5rem;border:1px solid #ccc;border-radius:8px}
 label{display:inline-block;min-width:11rem;margin:.2rem 0}
 input,select{margin:.2rem .5rem .2rem 0}
 button{padding:.4rem 1.2rem;margin-top:.5rem}
 pre{background:#f4f4f4;padding:.8rem;border-radius:6px;overflow:auto}
</style></head><body>
<h1>rvc_maker_tpu</h1>
<fieldset><legend><b>{{convert_audio}}</b></legend>
 <label>{{input_audio}}</label><input type="file" id="c_audio"><br>
 <label>{{model_path}}</label><input id="c_model" size="40"><br>
 <label>{{index_path}}</label><input id="c_index" size="40"><br>
 <label>{{pitch}}</label><input id="c_pitch" type="number" value="0"><br>
 <label>{{index_strength}}</label><input id="c_rate" type="number" step="0.05" value="0.5"><br>
 <label>{{protect}}</label><input id="c_protect" type="number" step="0.01" value="0.33"><br>
 <label>{{f0_method}}</label><select id="c_f0"><option>rmvpe</option><option>yin</option>
   <option>dio</option><option>harvest</option><option>swipe</option></select><br>
 <label>{{rmvpe_path}}</label><input id="c_rmvpe" size="40"><br>
 <label>{{embedder_path}}</label><input id="c_emb" size="40"><br>
 <button onclick="convert()">{{convert_audio}}</button>
 <div id="c_out"></div>
</fieldset>
<fieldset><legend><b>{{modelinfo}}</b></legend>
 <label>{{model_path}}</label><input id="i_model" size="40">
 <button onclick="info()">{{read_model}}</button>
 <pre id="i_out"></pre>
</fieldset>
<fieldset><legend><b>{{audio_effects}}</b></legend>
 <label>{{input_audio}}</label><input type="file" id="e_audio"><br>
 <label>{{reverb}}</label><input id="e_reverb" type="checkbox">
 <label>{{room_size}}</label><input id="e_room" type="number" step="0.05" value="0.5"><br>
 <label>{{pitch}}</label><input id="e_pitch" type="number" value="0"><br>
 <label>{{chorus}}</label><input id="e_chorus" type="checkbox">
 <label>{{delay}}</label><input id="e_delay" type="checkbox">
 <label>{{compressor}}</label><input id="e_comp" type="checkbox">
 <label>{{gain}}</label><input id="e_gain" type="number" value="0"><br>
 <button onclick="effects()">{{apply}}</button>
 <div id="e_out"></div>
</fieldset>
<fieldset><legend><b>{{training_model}}</b></legend>
 <label>{{training_model_name}}</label><input id="t_exp" size="40"><br>
 <label>{{dataset_folder}}</label><input id="t_data" size="40"><br>
 <label>{{sample_rate}}</label><select id="t_sr"><option>48000</option>
   <option>40000</option><option selected>32000</option></select>
 <label>{{training_version}}</label><select id="t_ver"><option selected>v2</option><option>v1</option></select><br>
 <label>{{embedder_path}}</label><input id="t_emb" size="40"><br>
 <label>{{total_epoch}}</label><input id="t_epochs" type="number" value="100">
 <label>{{batch_size}}</label><input id="t_bs" type="number" value="8"><br>
 <label>{{vocoder}}</label><select id="t_voc"><option selected>Default</option>
   <option>MRF HiFi-GAN</option><option>RefineGAN</option></select>
 <label>{{training_pitch}}</label><input id="t_f0" type="checkbox" checked><br>
 <button onclick="job('preprocess')">{{preprocess_button}}</button>
 <button onclick="job('extract')">{{extract_button}}</button>
 <button onclick="job('train')">{{train_button}}</button>
 <button onclick="jobStatus()">{{status}}</button>
 <pre id="t_out"></pre>
</fieldset>
<fieldset><legend><b>{{fushion}}</b></legend>
 <label>{{model_path}} A</label><input id="f_a" size="40"><br>
 <label>{{model_path}} B</label><input id="f_b" size="40"><br>
 <label>{{output_path}}</label><input id="f_out_path" size="40"><br>
 <label>{{model_ratio}}</label><input id="f_ratio" type="number" step="0.05" value="0.5"><br>
 <button onclick="fuse()">{{fushion}}</button>
 <pre id="f_out"></pre>
</fieldset>
<fieldset><legend><b>{{separator_tab}}</b></legend>
 <label>{{input_audio}}</label><input type="file" id="s_audio"><br>
 <label>{{separator_model}}</label><input id="s_model" size="40"><br>
 <label>{{mdx_n_fft}}</label><input id="s_nfft" type="number" value="6144">
 <label>{{hop_length}}</label><input id="s_hop" type="number" value="1024"><br>
 <button onclick="separate()">{{separator_tab}}</button>
 <div id="s_out"></div>
</fieldset>
<fieldset><legend><b>{{pytorch2onnx}}</b></legend>
 <label>{{model_path}}</label><input id="x_model" size="40"><br>
 <label>{{output_path}}</label><input id="x_out_path" size="40"><br>
 <label>{{max_frames}}</label><input id="x_frames" type="number" value="800"><br>
 <button onclick="exportOnnx()">{{pytorch2onnx}}</button>
 <pre id="x_out"></pre>
</fieldset>
<fieldset><legend><b>{{f0_extractor_tab}}</b></legend>
 <label>{{input_audio}}</label><input type="file" id="p_audio"><br>
 <label>{{f0_method}}</label><select id="p_method"><option>yin</option><option>pyin</option>
  <option>swipe</option><option>dio</option><option>harvest</option><option>pm</option></select><br>
 <button onclick="f0Extract()">{{extract_button}}</button>
 <pre id="p_out"></pre>
</fieldset>
<fieldset><legend><b>{{audio_editing}}</b></legend>
 <label>{{audio_path}}</label><input id="a_in" size="40"><br>
 <label>{{output_path}}</label><input id="a_out_path" size="40" value="audios/output.wav"><br>
 <label>{{audioldm2_model}}</label><select id="a_model"><option selected>audioldm2-music</option>
   <option>audioldm2</option><option>audioldm2-large</option></select><br>
 <label>{{source_prompt}}</label><input id="a_src" size="50"><br>
 <label>{{target_prompt}}</label><input id="a_tar" size="50"><br>
 <label>{{steps_label}}</label><input id="a_steps" type="number" value="50">
 <label>t_start (%)</label><input id="a_tstart" type="number" value="45"><br>
 <label>{{cfg_scale_src}}</label><input id="a_cfg_src" type="number" step="0.5" value="3">
 <label>{{cfg_scale_tar}}</label><input id="a_cfg_tar" type="number" step="0.5" value="12"><br>
 <label>{{sample_rate}}</label><input id="a_sr" type="number" value="44100">
 <label>{{export_format}}</label><select id="a_fmt"><option>wav</option><option>flac</option></select><br>
 <button onclick="audioEdit()">{{editing}}</button>
 <pre id="a_out"></pre>
</fieldset>
<fieldset><legend><b>{{convert_text}}</b></legend>
 <label>{{text_to_speech}}</label><input id="y_text" size="50"><br>
 <label>{{voice}}</label><input id="y_voice" size="30" value="en-US-EmmaMultilingualNeural">
 <label>{{googletts}}</label><input id="y_google" type="checkbox"><br>
 <label>{{voice_speed}}</label><input id="y_rate" type="number" value="0">
 <label>{{pitch}}</label><input id="y_pitch" type="number" value="0"><br>
 <label>{{model_path}}</label><input id="y_model" size="40"><br>
 <label>{{embedder_path}}</label><input id="y_emb" size="40">
 <label>{{rmvpe_path}}</label><input id="y_rmvpe" size="30"><br>
 <button onclick="tts()">{{convert_text}}</button>
 <div id="y_out"></div>
</fieldset>
<fieldset><legend><b>{{convert_with_whisper}}</b></legend>
 <label>{{input_audio}}</label><input type="file" id="w_audio"><br>
 <label>{{model_path}} A</label><input id="w_model_a" size="40"><br>
 <label>{{model_path}} B</label><input id="w_model_b" size="40"><br>
 <label>{{ecapa_path}}</label><input id="w_ecapa" size="40"><br>
 <label>{{whisper_path}}</label><input id="w_whisper" size="40">
 <label>{{vocab_path}}</label><input id="w_vocab" size="25"><br>
 <label>{{embedder_path}}</label><input id="w_emb" size="40">
 <label>{{rmvpe_path}}</label><input id="w_rmvpe" size="30"><br>
 <button onclick="convertWhisper()">{{convert_audio}}</button>
 <div id="w_out"></div>
</fieldset>
<fieldset><legend><b>{{createdataset}}</b></legend>
 <label>{{create_dataset_url}}</label><br>
 <textarea id="cd_inputs" rows="3" cols="60"></textarea><br>
 <label>{{output_folder}}</label><input id="cd_out_dir" size="40" value="./dataset">
 <label>{{sample_rate}}</label><input id="cd_sr" type="number" value="44100"><br>
 <label>{{separator_model}}</label><input id="cd_sep" size="40">
 <label>{{clear_dataset}}</label><input id="cd_clean" type="checkbox"><br>
 <button onclick="job2('create_dataset')">{{createdataset}}</button>
 <button onclick="jobStatus2()">{{status}}</button>
 <pre id="cd_out"></pre>
</fieldset>
<fieldset><legend><b>{{downloads}}</b></legend>
 <label>{{download_url}}</label><input id="d_url" size="50"><br>
 <label>{{output_folder}}</label><input id="d_dir" size="40" value="./assets/models"><br>
 <button onclick="download()">{{downloads}}</button>
 <label>{{search_models}}</label><input id="d_query" size="30">
 <button onclick="searchModels()">{{search_2}}</button>
 <pre id="d_out"></pre>
</fieldset>
<fieldset><legend><b>{{settings}}</b></legend>
 <label>{{lang}}</label><select id="g_lang"></select>
 <label>{{precision}}</label><select id="g_prec"><option>bf16</option><option>fp32</option></select>
 <button onclick="saveSettings()">{{apply}}</button>
 <pre id="g_out"></pre>
</fieldset>
<fieldset><legend><b>{{report_bugs}}</b></legend>
 <label>{{webhook_url}}</label><input id="b_hook" size="50"><br>
 <label>{{report_bug_info}}</label><br><textarea id="b_text" rows="3" cols="60"></textarea><br>
 <button onclick="reportBug()">{{report_bugs}}</button>
 <pre id="b_out"></pre>
</fieldset>
<script>
const TR = {{i18n_js}};
async function post(url, body){
  const r = await fetch(url, {method:'POST', headers:{'Content-Type':'application/json'},
                              body: JSON.stringify(body)});
  return r.json();
}
function fileB64(el){ return new Promise((res,rej)=>{
  const f = el.files[0]; if(!f){rej('no file');return;}
  const fr = new FileReader();
  fr.onload = ()=>res(fr.result.split(',')[1]); fr.readAsDataURL(f);
});}
async function convert(){
  document.getElementById('c_out').innerText = TR.processing;
  try{
    const audio = await fileB64(document.getElementById('c_audio'));
    const r = await post('/api/convert', {
      audio_b64: audio,
      model: document.getElementById('c_model').value,
      index: document.getElementById('c_index').value,
      pitch: +document.getElementById('c_pitch').value,
      index_rate: +document.getElementById('c_rate').value,
      protect: +document.getElementById('c_protect').value,
      f0_method: document.getElementById('c_f0').value,
      rmvpe: document.getElementById('c_rmvpe').value,
      embedder: document.getElementById('c_emb').value});
    if(r.error){document.getElementById('c_out').innerText = TR.error_occurred.replace('{e}', r.error); return;}
    const div = document.getElementById('c_out');
    div.innerHTML = '<audio controls src="data:audio/wav;base64,'+r.audio_b64+'"></audio>'
  }catch(e){document.getElementById('c_out').innerText = TR.error_occurred.replace('{e}', e);}
}
async function effects(){
  document.getElementById('e_out').innerText = TR.processing;
  try{
    const audio = await fileB64(document.getElementById('e_audio'));
    const r = await post('/api/effects', {audio_b64: audio,
      reverb: document.getElementById('e_reverb').checked,
      reverb_room_size: +document.getElementById('e_room').value,
      pitchshift: +document.getElementById('e_pitch').value != 0,
      pitch_shift: +document.getElementById('e_pitch').value,
      chorus: document.getElementById('e_chorus').checked,
      delay: document.getElementById('e_delay').checked,
      compressor: document.getElementById('e_comp').checked,
      gain: +document.getElementById('e_gain').value != 0,
      gain_db: +document.getElementById('e_gain').value});
    if(r.error){document.getElementById('e_out').innerText = TR.error_occurred.replace('{e}', r.error); return;}
    document.getElementById('e_out').innerHTML =
      '<audio controls src="data:audio/wav;base64,'+r.audio_b64+'"></audio>';
  }catch(e){document.getElementById('e_out').innerText = TR.error_occurred.replace('{e}', e);}
}
let lastJob = null;
async function job(kind){
  const r = await post('/api/job_start', {kind: kind,
    exp_dir: document.getElementById('t_exp').value,
    dataset: document.getElementById('t_data').value,
    sr: +document.getElementById('t_sr').value,
    version: document.getElementById('t_ver').value,
    embedder: document.getElementById('t_emb').value,
    epochs: +document.getElementById('t_epochs').value,
    batch_size: +document.getElementById('t_bs').value,
    vocoder: document.getElementById('t_voc').value,
    pitch_guidance: document.getElementById('t_f0').checked});
  lastJob = r.job_id;
  document.getElementById('t_out').innerText = JSON.stringify(r, null, 2);
}
async function jobStatus(){
  const r = await post('/api/job_status', {job_id: lastJob});
  document.getElementById('t_out').innerText =
    ('['+(r.done ? TR.done : TR.running)+'] ') + (r.error||'') + '\n' + (r.log||'');
}
async function audioEdit(){
  document.getElementById('a_out').innerText = TR.processing;
  const r = await post('/api/audio_edit', {
    input: document.getElementById('a_in').value,
    output: document.getElementById('a_out_path').value,
    model: document.getElementById('a_model').value,
    source_prompt: document.getElementById('a_src').value,
    target_prompt: document.getElementById('a_tar').value,
    steps: +document.getElementById('a_steps').value,
    t_start: +document.getElementById('a_tstart').value,
    cfg_scale_src: +document.getElementById('a_cfg_src').value,
    cfg_scale_tar: +document.getElementById('a_cfg_tar').value,
    sample_rate: +document.getElementById('a_sr').value,
    export_format: document.getElementById('a_fmt').value});
  document.getElementById('a_out').innerText = JSON.stringify(r, null, 2);
}
async function info(){
  const r = await post('/api/model_info', {model: document.getElementById('i_model').value});
  document.getElementById('i_out').innerText = JSON.stringify(r, null, 2);
}
async function fuse(){
  const r = await post('/api/fuse', {a: document.getElementById('f_a').value,
    b: document.getElementById('f_b').value, out: document.getElementById('f_out_path').value,
    ratio: +document.getElementById('f_ratio').value});
  document.getElementById('f_out').innerText = JSON.stringify(r, null, 2);
}
async function separate(){
  document.getElementById('s_out').innerText = TR.start_separator;
  try{
    const audio = await fileB64(document.getElementById('s_audio'));
    const r = await post('/api/separate', {audio_b64: audio,
      model: document.getElementById('s_model').value,
      mdx_n_fft: +document.getElementById('s_nfft').value,
      mdx_hop: +document.getElementById('s_hop').value});
    if(r.error){document.getElementById('s_out').innerText = TR.error_occurred.replace('{e}', r.error); return;}
    document.getElementById('s_out').innerHTML =
      'vocals: <audio controls src="data:audio/wav;base64,'+r.vocals_b64+'"></audio><br>' +
      'instrumental: <audio controls src="data:audio/wav;base64,'+r.instrumental_b64+'"></audio>';
  }catch(e){document.getElementById('s_out').innerText = TR.error_occurred.replace('{e}', e);}
}
async function exportOnnx(){
  const r = await post('/api/export_onnx', {model: document.getElementById('x_model').value,
    output: document.getElementById('x_out_path').value,
    max_frames: +document.getElementById('x_frames').value});
  document.getElementById('x_out').innerText = JSON.stringify(r, null, 2);
}
async function f0Extract(){
  document.getElementById('p_out').innerText = TR.start_extract;
  try{
    const audio = await fileB64(document.getElementById('p_audio'));
    const r = await post('/api/f0_extract', {audio_b64: audio,
      method: document.getElementById('p_method').value});
    if(r.error){document.getElementById('p_out').innerText = TR.error_occurred.replace('{e}', r.error); return;}
    document.getElementById('p_out').innerText =
      'frames: '+r.f0.length+' (10ms hop)\n'+r.f0.map(x=>x.toFixed(1)).join(' ');
  }catch(e){document.getElementById('p_out').innerText = TR.error_occurred.replace('{e}', e);}
}
async function download(){
  document.getElementById('d_out').innerText = TR.starting_download;
  const r = await post('/api/download', {url: document.getElementById('d_url').value,
    output: document.getElementById('d_dir').value});
  document.getElementById('d_out').innerText = JSON.stringify(r, null, 2);
}
async function searchModels(){
  document.getElementById('d_out').innerText = TR.processing;
  const r = await post('/api/search_models', {query: document.getElementById('d_query').value});
  document.getElementById('d_out').innerText = JSON.stringify(r, null, 2);
}
async function tts(){
  document.getElementById('y_out').innerText = TR.start_tts;
  const r = await post('/api/tts', {text: document.getElementById('y_text').value,
    voice: document.getElementById('y_voice').value,
    google: document.getElementById('y_google').checked,
    rate: +document.getElementById('y_rate').value,
    tts_pitch: +document.getElementById('y_pitch').value,
    model: document.getElementById('y_model').value,
    embedder: document.getElementById('y_emb').value,
    rmvpe: document.getElementById('y_rmvpe').value});
  if(r.error){document.getElementById('y_out').innerText = TR.error_occurred.replace('{e}', r.error); return;}
  let html = 'tts: <audio controls src="data:audio/wav;base64,'+r.audio_b64+'"></audio>';
  if(r.converted_b64) html += '<br>converted: <audio controls src="data:audio/wav;base64,'+r.converted_b64+'"></audio>';
  document.getElementById('y_out').innerHTML = html;
}
async function convertWhisper(){
  document.getElementById('w_out').innerText = TR.processing;
  try{
    const audio = await fileB64(document.getElementById('w_audio'));
    const r = await post('/api/convert_whisper', {audio_b64: audio,
      model_a: document.getElementById('w_model_a').value,
      model_b: document.getElementById('w_model_b').value,
      ecapa: document.getElementById('w_ecapa').value,
      whisper: document.getElementById('w_whisper').value,
      vocab: document.getElementById('w_vocab').value,
      embedder: document.getElementById('w_emb').value,
      rmvpe: document.getElementById('w_rmvpe').value});
    if(r.error){document.getElementById('w_out').innerText = TR.error_occurred.replace('{e}', r.error); return;}
    document.getElementById('w_out').innerHTML =
      '<audio controls src="data:audio/wav;base64,'+r.audio_b64+'"></audio>';
  }catch(e){document.getElementById('w_out').innerText = TR.error_occurred.replace('{e}', e);}
}
let lastJob2 = null;
async function job2(kind){
  const r = await post('/api/job_start', {kind: kind,
    inputs: document.getElementById('cd_inputs').value.split('\\n').filter(x=>x.trim()),
    output: document.getElementById('cd_out_dir').value,
    sr: +document.getElementById('cd_sr').value,
    separator: document.getElementById('cd_sep').value,
    clean: document.getElementById('cd_clean').checked});
  lastJob2 = r.job_id;
  document.getElementById('cd_out').innerText = JSON.stringify(r, null, 2);
}
async function jobStatus2(){
  const r = await post('/api/job_status', {job_id: lastJob2});
  document.getElementById('cd_out').innerText =
    ('['+(r.done ? TR.done : TR.running)+'] ') + (r.error||'') + '\n' + (r.log||'');
}
async function loadSettings(){
  const r = await post('/api/settings', {});
  const sel = document.getElementById('g_lang');
  sel.innerHTML = '';
  for(const l of r.languages){
    const o = document.createElement('option');
    o.text = l; o.selected = (l === r.language); sel.add(o);
  }
  document.getElementById('g_prec').value = r.precision;
}
async function saveSettings(){
  const r = await post('/api/settings', {
    language: document.getElementById('g_lang').value,
    precision: document.getElementById('g_prec').value});
  document.getElementById('g_out').innerText = JSON.stringify(r, null, 2);
}
async function reportBug(){
  document.getElementById('b_out').innerText = TR.processing;
  const r = await post('/api/report_bug', {
    webhook: document.getElementById('b_hook').value,
    text: document.getElementById('b_text').value});
  document.getElementById('b_out').innerText = JSON.stringify(r, null, 2);
}
loadSettings();
</script></body></html>
"""


# keys the page's JS needs for dynamic status/error text
_JS_KEYS = ("processing", "done", "running", "error_occurred",
            "start_separator", "start_extract", "starting_download",
            "start_tts")

_TEMPLATE_RE = None


def render_index() -> str:
    """Substitute every {{key}} in INDEX_HTML with the active locale's
    string (reference routes all UI text through `translations`,
    configs/config.py:29-46; here the page is rendered server-side so a
    language change + reload shows a fully translated UI)."""
    import html
    import re

    from ..utils.i18n import tr

    global _TEMPLATE_RE
    if _TEMPLATE_RE is None:
        _TEMPLATE_RE = re.compile(r"\{\{([a-z0-9_]+)\}\}")

    js = json.dumps({k: tr(k) for k in _JS_KEYS}, ensure_ascii=False)

    def sub(m):
        key = m.group(1)
        if key == "i18n_js":
            return js
        return html.escape(tr(key), quote=False)

    return _TEMPLATE_RE.sub(sub, INDEX_HTML)


def _raised_in_library(e: BaseException) -> bool:
    """True when the exception's traceback passes through rvc_maker_tpu
    code OUTSIDE this app/ package: a server-side fault (pipeline bug,
    corrupt model, divergent int8 trace), not a malformed request —
    even if its type is one the 400 classifier matches.  Request-parse
    errors (missing json field, bad base64, scipy failing on bad wav
    bytes) only traverse app/ and third-party frames."""
    import traceback

    pkg = os.sep + "rvc_maker_tpu" + os.sep
    app = pkg + "app" + os.sep
    for frame, _ in traceback.walk_tb(e.__traceback__):
        fn = frame.f_code.co_filename
        if pkg in fn and app not in fn:
            return True
    return False


def _wav_bytes_to_audio(data: bytes):
    from scipy.io import wavfile

    sr, wav = wavfile.read(io.BytesIO(data))
    if wav.dtype == np.int16:
        wav = wav.astype(np.float32) / 32768.0
    elif wav.dtype == np.int32:
        wav = wav.astype(np.float32) / 2147483648.0
    else:
        wav = wav.astype(np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    return wav, sr


def _audio_to_wav_b64(audio: np.ndarray, sr: int) -> str:
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, sr, (np.clip(audio, -1, 1) * 32767).astype(np.int16))
    return base64.b64encode(buf.getvalue()).decode()


def _get_pipeline(model: str, index: str, rmvpe: str, embedder: str):
    # the settings tab's precision choice selects the pipeline's compute
    # dtype (bf16 fast mode is the production default; fp32 = parity)
    precision = _SETTINGS.get("precision", "bf16")
    key = (model, index, rmvpe, embedder, precision)
    with _LOCK:
        if _STATE["pipeline_key"] == key:
            return _STATE["pipeline"]
    import jax

    from ..interop.onnx_embedder import load_embedder
    from ..interop.onnx_voice import load_voice_model
    from ..models import hubert as hubert_mod
    from ..pipelines.convert import ConvertPipeline
    from ..retrieval import load_index

    # .pth -> params pytree; .onnx -> OnnxVoiceModel / OnnxEmbedder
    synth_params, cfg, meta = load_voice_model(model)
    version = meta.get("version", "v2")
    hubert_params = (load_embedder(embedder) if embedder
                     else hubert_mod.init_params(jax.random.PRNGKey(0)))
    rmvpe_params = None
    if rmvpe:
        from ..models.rmvpe import load_rmvpe_pt

        rmvpe_params = load_rmvpe_pt(rmvpe)
    index_vectors = load_index(index).vectors if index else None
    import jax.numpy as jnp

    pipe = ConvertPipeline(synth_params, cfg, hubert_params, version=version,
                           rmvpe_params=rmvpe_params,
                           index_vectors=index_vectors,
                           compute_dtype=(jnp.bfloat16
                                          if precision == "bf16" else None))
    with _LOCK:
        _STATE["pipeline"] = pipe
        _STATE["pipeline_key"] = key
    return pipe


def _get_batcher(pipe):
    with _LOCK:
        if _STATE.get("batcher_pipe") is not pipe:
            if _STATE.get("batcher") is not None:
                _STATE["batcher"].close()
            from .batcher import ConvertBatcher

            _STATE["batcher"] = ConvertBatcher(pipe)
            _STATE["batcher_pipe"] = pipe
        return _STATE["batcher"]


class Handler(BaseHTTPRequestHandler):
    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            body = render_index().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/api/i18n":
            from ..utils.i18n import catalog, current_language

            self._json({"language": current_language(),
                        "strings": catalog()})
        else:
            self._json({"error": tr("not_found", name=self.path)}, 404)

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/api/convert":
                self._api_convert(req)
            elif self.path == "/api/model_info":
                from ..utils.model_tools import model_info

                self._json(model_info(req["model"]))
            elif self.path == "/api/effects":
                self._api_effects(req)
            elif self.path == "/api/job_start":
                self._json(_start_job(req))
            elif self.path == "/api/job_status":
                with _JOBS_LOCK:
                    job = _JOBS.get(req.get("job_id"))
                if job is None:
                    self._json({"error": tr("not_found",
                                            name=req.get("job_id"))}, 404)
                else:
                    self._json({"done": job["done"], "error": job["error"],
                                "log": "\n".join(job["log"][-40:])})
            elif self.path == "/api/fuse":
                from ..utils.model_tools import fuse_models

                out = fuse_models(req["a"], req["b"], req["out"],
                                  ratio=float(req.get("ratio", 0.5)))
                self._json({"output": out})
            elif self.path == "/api/separate":
                self._api_separate(req)
            elif self.path == "/api/export_onnx":
                from ..interop.onnx_voice import export_voice_model

                out = export_voice_model(
                    req["model"], req["output"],
                    max_frames=int(req.get("max_frames", 800)),
                    dynamic=not req.get("static", False))
                self._json({"output": out})
            elif self.path == "/api/f0_extract":
                self._api_f0_extract(req)
            elif self.path == "/api/download":
                from ..utils.scrapers import download_any

                out = download_any(req["url"], req.get("output", "."))
                self._json({"output": out})
            elif self.path == "/api/tts":
                self._api_tts(req)
            elif self.path == "/api/audio_edit":
                self._api_audio_edit(req)
            elif self.path == "/api/convert_whisper":
                self._api_convert_whisper(req)
            elif self.path == "/api/settings":
                self._api_settings(req)
            elif self.path == "/api/search_models":
                self._json({"models": _search_hf_models(req["query"])})
            elif self.path == "/api/report_bug":
                self._json(_report_bug(req["webhook"], req["text"]))
            else:
                self._json({"error": tr("not_found", name=self.path)}, 404)
        except Exception as e:  # surface errors to the UI
            import binascii

            from .batcher import BatcherOverloaded

            if isinstance(e, BatcherOverloaded):
                # backpressure: tell the client to retry, keep serving
                self._json({"error": str(e), "retry": True}, 503)
            elif (isinstance(e, (KeyError, ValueError, TypeError,
                                 binascii.Error, json.JSONDecodeError))
                  and not _raised_in_library(e)):
                # malformed request (missing field, bad base64/wav/json
                # — raised while this module parses the request): client
                # error, not a server fault, and never fatal to the
                # serving process.  The same exception TYPES raised deep
                # in library code (e.g. Int8Ctx signature mismatch, a
                # corrupt model file) are server faults: those keep the
                # 500 + full-traceback branch below instead of being
                # silently blamed on the client (review r5).
                logger.warning("%s", tr("bad_request", path=self.path,
                                        error=repr(e)), exc_info=True)
                self._json({"error": tr("bad_request", path=self.path,
                                        error=str(e))}, 400)
            else:
                logger.exception("request failed")
                self._json({"error": str(e)}, 500)

    def _api_convert(self, req):
        from ..pipelines.convert import ConvertSettings
        from ..utils.audio import resample

        # chip-contention policy: while a training job owns the device,
        # conversion requests are refused with 503/retry instead of
        # silently multiplying the training step time (the reference's
        # subprocess model simply contends; an in-process server states
        # its policy).  RVC_TPU_SERVE_DURING_TRAIN=1 opts into contention.
        if os.environ.get("RVC_TPU_SERVE_DURING_TRAIN", "0") != "1":
            with _JOBS_LOCK:
                busy = [j for j_id, j in _JOBS.items()
                        if j_id.startswith("train-") and not j["done"]]
            if busy:
                self._json({"error": tr("busy_training"), "retry": True},
                           503)
                return

        wav, sr = _wav_bytes_to_audio(base64.b64decode(req["audio_b64"]))
        audio16 = resample(wav, sr, 16000)
        peak = np.abs(audio16).max() / 0.95
        if peak > 1:
            audio16 = audio16 / peak
        f0_method = req.get("f0_method", "rmvpe")
        if f0_method == "rmvpe" and not req.get("rmvpe"):
            f0_method = "yin"
        pipe = _get_pipeline(req["model"], req.get("index", ""),
                             req.get("rmvpe", ""), req.get("embedder", ""))
        settings = ConvertSettings(
            pitch=int(req.get("pitch", 0)),
            index_rate=float(req.get("index_rate", 0.5)),
            protect=float(req.get("protect", 0.33)),
            f0_method=f0_method)
        if os.environ.get("RVC_TPU_BATCH_SERVE") == "1":
            # concurrent requests ride one device batch (app/batcher.py)
            out = _get_batcher(pipe).convert(audio16,
                                             int(req.get("sid", 0)),
                                             settings)
        else:
            out = pipe.convert_utterance(audio16, int(req.get("sid", 0)),
                                         settings)
        self._json({"audio_b64": _audio_to_wav_b64(out, pipe.cfg.sr),
                    "sr": pipe.cfg.sr})

    def _api_separate(self, req):
        wav, sr = _wav_bytes_to_audio(base64.b64decode(req["audio_b64"]))
        stereo = np.stack([wav, wav], axis=0)
        model = req["model"]
        if model.endswith(".onnx"):
            from ..interop.onnx_run import OnnxGraph
            from ..pipelines import mdx as mdx_mod

            graph = OnnxGraph(model)
            p = mdx_mod.params_from_graph(
                graph, n_fft=int(req.get("mdx_n_fft", 6144)),
                hop_length=int(req.get("mdx_hop", 1024)))
            vocals, inst = mdx_mod.mdx_separate(graph, stereo, p)
            out_sr = sr
        else:
            from ..interop.demucs_load import load_demucs_th
            from ..pipelines.separate import separate_vocals

            params, cfg = load_demucs_th(model)
            v, i = separate_vocals(params, cfg, wav, sr)  # each (L, 2)
            vocals, inst = np.asarray(v).T, np.asarray(i).T
            out_sr = cfg.samplerate
        self._json({
            "vocals_b64": _audio_to_wav_b64(np.asarray(vocals).mean(0),
                                            out_sr),
            "instrumental_b64": _audio_to_wav_b64(np.asarray(inst).mean(0),
                                                  out_sr),
            "sr": out_sr})

    def _api_f0_extract(self, req):
        from ..pipelines.convert import WINDOW
        from ..utils.audio import resample

        wav, sr = _wav_bytes_to_audio(base64.b64decode(req["audio_b64"]))
        audio16 = resample(wav, sr, 16000).astype(np.float32)
        method = req.get("method", "yin")
        if method in ("yin",):
            import jax.numpy as jnp

            from ..f0.yin import yin

            f0 = np.asarray(yin(jnp.asarray(audio16[None]), sr=16000,
                                fmin=50.0, fmax=1100.0,
                                hop_length=WINDOW))[0]
        elif method == "pyin":
            from ..f0.pyin import pyin

            f0, _, _ = pyin(audio16, sr=16000, hop_length=WINDOW)
        elif method == "swipe":
            from ..f0.swipe import swipe

            f0, _ = swipe(audio16, 16000)
        elif method == "pm":
            from ..f0.praat_ac import praat_ac

            f0 = praat_ac(audio16, 16000)
        elif method in ("dio", "harvest"):
            from .. import native

            fn = native.dio if method == "dio" else native.harvest
            f0 = fn(audio16.astype(np.float64), 16000)[0]
        else:
            raise ValueError(f"unknown f0 method {method!r}")
        self._json({"f0": [float(x) for x in np.asarray(f0).ravel()],
                    "hop_ms": 10.0})

    def _api_effects(self, req):
        import dataclasses

        from ..utils.effects import EffectsSettings, apply_effects

        wav, sr = _wav_bytes_to_audio(base64.b64decode(req["audio_b64"]))
        fields = {f.name for f in dataclasses.fields(EffectsSettings)}
        settings = EffectsSettings(**{k: v for k, v in req.items()
                                      if k in fields})
        out, out_sr = apply_effects(wav, sr, settings)
        self._json({"audio_b64": _audio_to_wav_b64(out, out_sr),
                    "sr": out_sr})

    def _api_tts(self, req):
        """TTS tab (reference app.py:2080): synthesize (edge protocol or
        Google), optionally convert through a voice model."""
        import tempfile

        from ..utils import edge_tts_client as etc
        from ..utils.tts import _read_tts_output, synthesize_tts

        google = bool(req.get("google"))
        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/tts.wav"
            synthesize_tts(
                req["text"], req.get("voice", etc.DEFAULT_VOICE), path,
                rate=int(req.get("rate", 0)),
                pitch=int(req.get("tts_pitch", 0)), google=google,
                endpoint=req.get("endpoint"),
                output_format=None if google else etc.PCM_FORMAT)
            audio24 = _read_tts_output(path, 24000)
        resp = {"audio_b64": _audio_to_wav_b64(audio24, 24000), "sr": 24000}
        if req.get("model"):
            from ..pipelines.convert import ConvertSettings
            from ..utils.audio import resample

            audio16 = resample(audio24, 24000, 16000)
            peak = np.abs(audio16).max() / 0.95
            if peak > 1:
                audio16 = audio16 / peak
            f0_method = req.get("f0_method", "rmvpe")
            if f0_method == "rmvpe" and not req.get("rmvpe"):
                f0_method = "yin"
            pipe = _get_pipeline(req["model"], req.get("index", ""),
                                 req.get("rmvpe", ""), req.get("embedder", ""))
            out = pipe.convert_utterance(
                audio16, int(req.get("sid", 0)),
                ConvertSettings(pitch=int(req.get("pitch", 0)),
                                index_rate=float(req.get("index_rate", 0.5)),
                                protect=float(req.get("protect", 0.33)),
                                f0_method=f0_method))
            resp["converted_b64"] = _audio_to_wav_b64(out, pipe.cfg.sr)
            resp["converted_sr"] = pipe.cfg.sr
        self._json(resp)

    def _api_audio_edit(self, req):
        """Audio-editing tab (reference app.py:2226 -> run_audioldm2 ->
        main/inference/audioldm2.py).  The diffusion checkpoint stack is
        download-gated (same as the reference without network); tests
        exercise the full pipeline via the toy latent stack."""
        from ..edit.pipeline import ToyMelStack, edit

        stack = ToyMelStack() if req.get("toy_stack") else None
        out = edit(
            req["input"], req.get("output", "audios/output.wav"),
            model_id=req.get("model", "audioldm2-music"),
            source_prompt=req.get("source_prompt", ""),
            target_prompt=req.get("target_prompt", ""),
            steps=int(req.get("steps", 50)),
            cfg_scale_src=float(req.get("cfg_scale_src", 3.5)),
            cfg_scale_tar=float(req.get("cfg_scale_tar", 12.0)),
            t_start=int(req.get("t_start", 45)),
            sr=int(req.get("sample_rate", 44100)),
            export_format=req.get("export_format", "wav"),
            stack=stack)
        self._json({"output": out})

    def _api_convert_whisper(self, req):
        """Diarized two-model conversion (reference convert_with_whisper
        app.py:1022-1164): segments -> ECAPA clustering -> alternate
        voice models per speaker."""
        from ..models.ecapa_tdnn import load_ecapa_ckpt
        from ..pipelines.convert import ConvertSettings
        from ..speaker.diarize import convert_with_diarization
        from ..utils.audio import resample

        wav, sr = _wav_bytes_to_audio(base64.b64decode(req["audio_b64"]))
        audio16 = resample(wav, sr, 16000)
        f0_method = req.get("f0_method", "rmvpe")
        if f0_method == "rmvpe" and not req.get("rmvpe"):
            f0_method = "yin"
        settings = ConvertSettings(
            pitch=int(req.get("pitch", 0)),
            index_rate=float(req.get("index_rate", 0.5)),
            protect=float(req.get("protect", 0.33)), f0_method=f0_method)
        models = [m for m in (req.get("model_a"), req.get("model_b")) if m]
        if not models:
            raise ValueError("need at least model_a")
        pipes = [_build_uncached_pipeline(m, req.get("index", ""),
                                          req.get("rmvpe", ""),
                                          req.get("embedder", ""))
                 for m in models]
        ecapa_params = load_ecapa_ckpt(req["ecapa"])
        whisper = None
        if req.get("whisper"):
            from ..models.whisper import load_whisper_pt
            from ..speaker.whisper_tokenizer import WhisperTokenizer

            params, dims = load_whisper_pt(req["whisper"])
            tok = WhisperTokenizer(req["vocab"], multilingual=True)
            whisper = (params, dims, tok)
        out = convert_with_diarization(
            audio16, pipes, [settings] * len(pipes), ecapa_params,
            whisper=whisper)
        self._json({"audio_b64": _audio_to_wav_b64(out, pipes[0].cfg.sr),
                    "sr": pipes[0].cfg.sr})

    def _api_settings(self, req):
        """Settings tab (reference app.py:2981 rewrites config.json +
        restarts; here settings apply live and persist)."""
        from ..utils.i18n import available_languages, set_language

        if req.get("language") or req.get("precision"):
            if req.get("language"):
                set_language(req["language"])
                _SETTINGS["language"] = req["language"]
            if req.get("precision"):
                _SETTINGS["precision"] = req["precision"]
            _save_settings()
        self._json({"language": _SETTINGS.get("language", "en-US"),
                    "precision": _SETTINGS.get("precision", "bf16"),
                    "languages": available_languages()})

    def log_message(self, fmt, *args):  # route to logging, not stderr
        logger.info("%s " + fmt, self.address_string(), *args)


_SETTINGS_PATH = os.path.expanduser("~/.rvc_maker_tpu.json")
_SETTINGS: dict = {}
try:
    with open(_SETTINGS_PATH, encoding="utf-8") as _f:
        _SETTINGS.update(json.load(_f))
except (OSError, ValueError):
    pass

# honor the persisted language on startup (reference Config.multi_language
# reads config.json's "language", configs/config.py:29-46)
if _SETTINGS.get("language"):
    from ..utils.i18n import set_language as _set_language

    _set_language(_SETTINGS["language"])


def _save_settings() -> None:
    try:
        with open(_SETTINGS_PATH, "w", encoding="utf-8") as f:
            json.dump(_SETTINGS, f, indent=2)
    except OSError:
        logger.warning("%s", tr("settings_persist_failed", path=_SETTINGS_PATH))


def _build_uncached_pipeline(model: str, index: str, rmvpe: str,
                             embedder: str):
    """Like _get_pipeline but without the single-slot cache — the
    diarized flow needs two models alive at once."""
    import jax

    from ..interop.onnx_embedder import load_embedder
    from ..interop.onnx_voice import load_voice_model
    from ..models import hubert as hubert_mod
    from ..pipelines.convert import ConvertPipeline
    from ..retrieval import load_index

    synth_params, cfg, meta = load_voice_model(model)
    hubert_params = (load_embedder(embedder) if embedder
                     else hubert_mod.init_params(jax.random.PRNGKey(0)))
    rmvpe_params = None
    if rmvpe:
        from ..models.rmvpe import load_rmvpe_pt

        rmvpe_params = load_rmvpe_pt(rmvpe)
    return ConvertPipeline(
        synth_params, cfg, hubert_params,
        version=meta.get("version", "v2"), rmvpe_params=rmvpe_params,
        index_vectors=load_index(index).vectors if index else None)


def _search_hf_models(query: str, limit: int = 20) -> list[dict]:
    """HuggingFace model search (reference search_models app.py:327-348;
    network)."""
    import urllib.parse
    import urllib.request

    url = ("https://huggingface.co/api/models?search="
           + urllib.parse.quote(query) + f"&limit={limit}")
    with urllib.request.urlopen(url, timeout=15) as resp:
        items = json.loads(resp.read().decode())
    return [{"id": it.get("id"), "downloads": it.get("downloads"),
             "likes": it.get("likes")} for it in items]


def _report_bug(webhook_url: str, text: str) -> dict:
    """Discord-webhook bug report (reference report-bugs tab,
    app.py:1400; network)."""
    import urllib.request

    if not webhook_url.startswith("https://"):
        raise ValueError("webhook must be an https URL")
    data = json.dumps({"content": text[:1900]}).encode()
    req = urllib.request.Request(
        webhook_url, data=data,
        headers={"Content-Type": "application/json",
                 "User-Agent": "rvc_maker_tpu"})
    with urllib.request.urlopen(req, timeout=15) as resp:
        return {"status": resp.status}


def _start_job(req: dict) -> dict:
    """Run a training-stage job in a background thread with a captured
    log, mirroring the reference app's subprocess-per-action tabs
    (app.py:839) without the subprocess."""
    import itertools

    kind = req.get("kind")
    if kind not in ("preprocess", "extract", "train", "create_dataset"):
        raise ValueError(f"unknown job kind {kind!r}")
    with _JOBS_LOCK:
        job_id = f"{kind}-{next(_start_job._counter)}"
        job = {"log": [], "done": False, "error": None}
        _JOBS[job_id] = job

    class _Buf(logging.Handler):
        def emit(self, record):
            job["log"].append(self.format(record))

    def _run():
        handler = _Buf()
        handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        root = logging.getLogger("rvc_maker_tpu")
        root.addHandler(handler)
        try:
            if kind == "create_dataset":
                from ..pipelines.create_dataset import create_dataset

                separator = None
                if req.get("separator"):
                    from ..interop.demucs_load import load_demucs_th

                    separator = load_demucs_th(req["separator"])
                written = create_dataset(
                    req["inputs"], req.get("output", "./dataset"),
                    sample_rate=int(req.get("sr", 44100)),
                    separator=separator,
                    clean_dataset=bool(req.get("clean")))
                job["log"].append(f"create_dataset: {len(written)} files")
                return
            exp_dir = req["exp_dir"]
            if kind == "preprocess":
                from ..pipelines.preprocess import preprocess_dataset

                n = preprocess_dataset(req["dataset"], exp_dir,
                                       int(req.get("sr", 32000)))
                job["log"].append(f"preprocess: {n} segments")
            elif kind == "extract":
                import jax

                from ..models import hubert as hubert_mod
                from ..config import preset
                from ..pipelines.extract import (extract_embeddings,
                                                 extract_f0,
                                                 generate_filelist)

                version = req.get("version", "v2")
                emb = req.get("embedder", "")
                hubert_params = (hubert_mod.load_fairseq_pt(emb) if emb else
                                 hubert_mod.init_params(jax.random.PRNGKey(0)))
                rmvpe_params = None
                if req.get("rmvpe"):
                    from ..models.rmvpe import load_rmvpe_pt

                    rmvpe_params = load_rmvpe_pt(req["rmvpe"])
                extract_f0(exp_dir,
                           method="rmvpe" if rmvpe_params else "yin",
                           rmvpe_params=rmvpe_params)
                extract_embeddings(exp_dir, hubert_params, version=version)
                generate_filelist(exp_dir,
                                  preset(version, int(req.get("sr", 32000))),
                                  version=version)
                job["log"].append("extract: done")
            else:
                from ..config import RVCConfig, preset
                from ..pipelines.train_loop import train

                cfg = preset(req.get("version", "v2"),
                             int(req.get("sr", 32000)),
                             vocoder=req.get("vocoder", "Default"),
                             pitch_guidance=bool(
                                 req.get("pitch_guidance", True)))
                train(exp_dir, cfg, total_epochs=int(req.get("epochs", 100)),
                      batch_size=int(req.get("batch_size", 8)),
                      pretrain_g=req.get("pretrain_g", ""),
                      pretrain_d=req.get("pretrain_d", ""))
                job["log"].append("train: done")
        except Exception as e:  # noqa: BLE001 — surfaced via status API
            logger.exception("job %s failed", job_id)
            job["error"] = str(e)
        finally:
            job["done"] = True
            root.removeHandler(handler)

    t = threading.Thread(target=_run, daemon=True, name=job_id)
    job["thread"] = t
    t.start()
    return {"job_id": job_id}


_start_job._counter = __import__("itertools").count()


def warm(model: str, index: str = "", rmvpe: str = "", embedder: str = "",
         buckets: str = "3,5") -> float:
    """Build the serving pipeline and precompile its bucket shapes BEFORE
    accepting traffic (the reference keeps a long-lived process to avoid
    first-request latency, app.py:1541-3076; our first request is an XLA
    compile unless it replays from the persistent cache populated here).

    buckets: comma list of utterance bucket seconds, optionally 'BxS'
    for batch x seconds (see utils.warmup.parse_warm_spec)."""
    from ..utils.warmup import parse_warm_spec, warm_pipeline

    pipe = _get_pipeline(model, index, rmvpe, embedder)
    total = 0.0
    for b, s in parse_warm_spec(buckets) or [(1, 3)]:
        total += warm_pipeline(pipe, seconds=(s,), batches=(b,))
    return total


def serve(host: str = "0.0.0.0", port: int = 7865, *,
          warm_model: str = "", warm_index: str = "", warm_rmvpe: str = "",
          warm_embedder: str = "", warm_buckets: str = "3,5"):
    from ..utils.warmup import enable_compilation_cache

    enable_compilation_cache()
    if warm_model:
        logger.info("%s", tr("warming_up", model=warm_model))
        dt = warm(warm_model, warm_index, warm_rmvpe, warm_embedder,
                  warm_buckets)
        logger.info("%s", tr("warmup_done", seconds=f"{dt:.1f}"))
    httpd = ThreadingHTTPServer((host, port), Handler)
    logger.info("%s", tr("serving_on", url=f"http://{host}:{port}"))
    httpd.serve_forever()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7865)
    ap.add_argument("--warm-model", default="",
                    help="precompile this voice model before serving")
    ap.add_argument("--warm-index", default="")
    ap.add_argument("--warm-rmvpe", default="")
    ap.add_argument("--warm-embedder", default="")
    ap.add_argument("--warm-buckets", default="3,5",
                    help="bucket seconds to precompile, e.g. '3,5' or '4x3'")
    a = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    serve(a.host, a.port, warm_model=a.warm_model, warm_index=a.warm_index,
          warm_rmvpe=a.warm_rmvpe, warm_embedder=a.warm_embedder,
          warm_buckets=a.warm_buckets)
