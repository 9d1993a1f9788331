"""Standalone interactive HTML/WebGL particle viewer.

``pysph view <dir> --html out.html`` exports ONE self-contained HTML
file (no network, no external JS) embedding every dump as binary
base64 buffers plus a minimal WebGL point renderer: orbit/zoom with
the mouse, frame scrubbing and playback, scalar selection with a
viridis colormap, per-array visibility toggles.  This is the
shareable-artifact analog of the reference Mayavi/ipywidgets viewers
(/root/reference/pysph/tools/mayavi_viewer.py,
ipy_viewer.py) for headless TPU machines."""

import base64
import json
import os

import numpy as np

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pysph_tpu viewer</title>
<style>
 body { margin:0; background:#111; color:#ddd;
        font:13px system-ui, sans-serif; }
 #bar { padding:6px 10px; display:flex; gap:12px;
        align-items:center; flex-wrap:wrap; }
 #gl  { display:block; width:100vw; height:calc(100vh - 46px); }
 select, input[type=range], button {
   background:#222; color:#ddd; border:1px solid #444; }
 .tog { margin-right:4px; }
</style></head><body>
<div id="bar">
 <button id="play">&#9654;</button>
 <input type="range" id="frame" min="0" max="0" value="0"
        style="width:220px">
 <span id="tlabel"></span>
 <label>color <select id="prop"></select></label>
 <span id="arrays"></span>
 <span style="opacity:.6">drag: rotate &middot; wheel: zoom &middot;
 shift-drag: pan</span>
</div>
<canvas id="gl"></canvas>
<script>
"use strict";
const DATA = __DATA__;
const FRAMES = DATA.frames, NAMES = DATA.names, PROPS = DATA.props;

function decode(b64) {
  const s = atob(b64), a = new Uint8Array(s.length);
  for (let i = 0; i < s.length; i++) a[i] = s.charCodeAt(i);
  return new Float32Array(a.buffer);
}
// lazily decoded per frame: {name: {x,y,z, props:{p:...}}}
const cache = new Map();
function frame(i) {
  if (!cache.has(i)) {
    const f = {};
    for (const name of NAMES) {
      const raw = FRAMES[i][name];
      const o = {x: decode(raw.x), y: decode(raw.y),
                 z: decode(raw.z), props: {}};
      for (const p of PROPS) if (raw[p]) o.props[p] = decode(raw[p]);
      f[name] = o;
    }
    cache.set(i, f);
  }
  return cache.get(i);
}

const canvas = document.getElementById('gl');
const gl = canvas.getContext('webgl');
const vsrc = `attribute vec3 aPos; attribute float aVal;
 uniform mat4 uMVP; uniform float uSize; varying float vVal;
 void main(){ gl_Position = uMVP * vec4(aPos, 1.0);
   gl_PointSize = uSize; vVal = aVal; }`;
const fsrc = `precision mediump float; varying float vVal;
 vec3 viridis(float t){
   t = clamp(t, 0.0, 1.0);
   const vec3 c0 = vec3(0.267, 0.005, 0.329);
   const vec3 c1 = vec3(0.283, 0.141, 0.458);
   const vec3 c2 = vec3(0.254, 0.265, 0.530);
   const vec3 c3 = vec3(0.207, 0.372, 0.553);
   const vec3 c4 = vec3(0.164, 0.471, 0.558);
   const vec3 c5 = vec3(0.128, 0.567, 0.551);
   const vec3 c6 = vec3(0.135, 0.659, 0.518);
   const vec3 c7 = vec3(0.267, 0.749, 0.441);
   const vec3 c8 = vec3(0.478, 0.821, 0.318);
   const vec3 c9 = vec3(0.741, 0.873, 0.150);
   const vec3 cA = vec3(0.993, 0.906, 0.144);
   float s = t * 10.0; int i = int(floor(s)); float f = fract(s);
   if (i == 0) return mix(c0, c1, f); if (i == 1) return mix(c1, c2, f);
   if (i == 2) return mix(c2, c3, f); if (i == 3) return mix(c3, c4, f);
   if (i == 4) return mix(c4, c5, f); if (i == 5) return mix(c5, c6, f);
   if (i == 6) return mix(c6, c7, f); if (i == 7) return mix(c7, c8, f);
   if (i == 8) return mix(c8, c9, f); return mix(c9, cA, f);
 }
 void main(){
   vec2 d = gl_PointCoord - vec2(0.5);
   if (dot(d, d) > 0.25) discard;
   gl_FragColor = vec4(viridis(vVal), 1.0); }`;
function shader(type, src) {
  const s = gl.createShader(type); gl.shaderSource(s, src);
  gl.compileShader(s); return s;
}
const prog = gl.createProgram();
gl.attachShader(prog, shader(gl.VERTEX_SHADER, vsrc));
gl.attachShader(prog, shader(gl.FRAGMENT_SHADER, fsrc));
gl.linkProgram(prog); gl.useProgram(prog);
const aPos = gl.getAttribLocation(prog, 'aPos');
const aVal = gl.getAttribLocation(prog, 'aVal');
const uMVP = gl.getUniformLocation(prog, 'uMVP');
const uSize = gl.getUniformLocation(prog, 'uSize');
const posBuf = gl.createBuffer(), valBuf = gl.createBuffer();

// --- tiny mat4 helpers -------------------------------------------------
function mmul(a, b) {
  const o = new Float32Array(16);
  for (let c = 0; c < 4; c++) for (let r = 0; r < 4; r++) {
    let s = 0;
    for (let k = 0; k < 4; k++) s += a[k*4+r] * b[c*4+k];
    o[c*4+r] = s;
  }
  return o;
}
function persp(fov, asp, near, far) {
  const f = 1 / Math.tan(fov / 2), nf = 1 / (near - far);
  return new Float32Array([f/asp,0,0,0, 0,f,0,0,
    0,0,(far+near)*nf,-1, 0,0,2*far*near*nf,0]);
}
function rotx(t){const c=Math.cos(t),s=Math.sin(t);
  return new Float32Array([1,0,0,0, 0,c,s,0, 0,-s,c,0, 0,0,0,1]);}
function roty(t){const c=Math.cos(t),s=Math.sin(t);
  return new Float32Array([c,0,-s,0, 0,1,0,0, s,0,c,0, 0,0,0,1]);}
function trans(x,y,z){return new Float32Array(
  [1,0,0,0, 0,1,0,0, 0,0,1,0, x,y,z,1]);}
function scale(s){return new Float32Array(
  [s,0,0,0, 0,s,0,0, 0,0,s,0, 0,0,0,1]);}

// --- state -------------------------------------------------------------
let cur = 0, playing = false, prop = DATA.default_prop;
let rx = DATA.is3d ? -1.0 : 0.0, ry = 0.0, zoom = 1.0;
let panx = 0, pany = 0;
const shown = {}; NAMES.forEach(n => shown[n] = true);
const C = DATA.center, R = DATA.radius;

function draw() {
  const w = canvas.clientWidth, h = canvas.clientHeight;
  if (canvas.width !== w || canvas.height !== h) {
    canvas.width = w; canvas.height = h;
  }
  gl.viewport(0, 0, w, h);
  gl.clearColor(0.066, 0.066, 0.066, 1);
  gl.enable(gl.DEPTH_TEST);
  gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);
  let mvp = persp(0.9, w / h, 0.01, 100);
  mvp = mmul(mvp, trans(panx, pany, -2.6 / zoom));
  mvp = mmul(mvp, rotx(rx));
  mvp = mmul(mvp, roty(ry));
  mvp = mmul(mvp, scale(1.0 / R));
  mvp = mmul(mvp, trans(-C[0], -C[1], -C[2]));
  gl.uniformMatrix4fv(uMVP, false, mvp);
  gl.uniform1f(uSize, Math.max(2.0, 4.0 * zoom));

  const f = frame(cur);
  // shared scalar range across arrays for a consistent colormap
  let lo = 1e30, hi = -1e30;
  for (const n of NAMES) {
    if (!shown[n] || !f[n].props[prop]) continue;
    for (const v of f[n].props[prop]) {
      if (v < lo) lo = v; if (v > hi) hi = v;
    }
  }
  const span = (hi - lo) > 1e-30 ? hi - lo : 1.0;
  for (const n of NAMES) {
    if (!shown[n]) continue;
    const o = f[n], np = o.x.length;
    const pos = new Float32Array(np * 3);
    for (let i = 0; i < np; i++) {
      pos[3*i] = o.x[i]; pos[3*i+1] = o.y[i]; pos[3*i+2] = o.z[i];
    }
    const vals = new Float32Array(np);
    const pv = o.props[prop];
    if (pv) for (let i = 0; i < np; i++) vals[i] = (pv[i]-lo)/span;
    gl.bindBuffer(gl.ARRAY_BUFFER, posBuf);
    gl.bufferData(gl.ARRAY_BUFFER, pos, gl.DYNAMIC_DRAW);
    gl.enableVertexAttribArray(aPos);
    gl.vertexAttribPointer(aPos, 3, gl.FLOAT, false, 0, 0);
    gl.bindBuffer(gl.ARRAY_BUFFER, valBuf);
    gl.bufferData(gl.ARRAY_BUFFER, vals, gl.DYNAMIC_DRAW);
    gl.enableVertexAttribArray(aVal);
    gl.vertexAttribPointer(aVal, 1, gl.FLOAT, false, 0, 0);
    gl.drawArrays(gl.POINTS, 0, np);
  }
  document.getElementById('tlabel').textContent =
    't = ' + DATA.times[cur].toPrecision(5) + '  (' + (cur+1) +
    '/' + FRAMES.length + ')';
}

// --- UI ---------------------------------------------------------------
const slider = document.getElementById('frame');
slider.max = FRAMES.length - 1;
slider.oninput = () => { cur = +slider.value; draw(); };
const sel = document.getElementById('prop');
for (const p of PROPS) {
  const o = document.createElement('option');
  o.value = p; o.textContent = p; if (p === prop) o.selected = true;
  sel.appendChild(o);
}
sel.onchange = () => { prop = sel.value; draw(); };
const ar = document.getElementById('arrays');
for (const n of NAMES) {
  const l = document.createElement('label'); l.className = 'tog';
  const c = document.createElement('input');
  c.type = 'checkbox'; c.checked = true;
  c.onchange = () => { shown[n] = c.checked; draw(); };
  l.appendChild(c); l.appendChild(document.createTextNode(n));
  ar.appendChild(l);
}
document.getElementById('play').onclick = function () {
  playing = !playing;
  this.innerHTML = playing ? '&#10074;&#10074;' : '&#9654;';
  if (playing) tick();
};
function tick() {
  if (!playing) return;
  cur = (cur + 1) % FRAMES.length; slider.value = cur; draw();
  setTimeout(tick, 100);
}
let drag = null;
canvas.onmousedown = e => drag = [e.clientX, e.clientY, e.shiftKey];
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (drag[2]) { panx += dx * 0.003 / zoom; pany -= dy * 0.003 / zoom; }
  else { ry += dx * 0.01; rx += dy * 0.01; }
  drag = [e.clientX, e.clientY, drag[2]];
  draw();
};
canvas.onwheel = e => {
  e.preventDefault();
  zoom *= Math.exp(-e.deltaY * 0.001); draw();
};
window.onresize = draw;
window.onkeydown = e => {
  if (e.key === 'ArrowRight') { cur = Math.min(cur+1, FRAMES.length-1); }
  else if (e.key === 'ArrowLeft') { cur = Math.max(cur-1, 0); }
  else return;
  slider.value = cur; draw();
};
draw();
</script></body></html>
"""


def _b64(arr):
    return base64.b64encode(
        np.ascontiguousarray(arr, dtype=np.float32).tobytes()).decode()


def write_html(files, out, prop='p', props=None, max_frames=200):
    """Export the dumps as one self-contained interactive HTML file.

    ``props`` limits the embedded scalars (default: a standard set
    intersected with what the arrays carry).  Frames beyond
    ``max_frames`` are subsampled evenly to bound the file size."""
    from pysph_tpu.solver.output import load

    if len(files) > max_frames:
        idx = np.linspace(0, len(files) - 1, max_frames).astype(int)
        files = [files[i] for i in sorted(set(idx.tolist()))]

    frames, times = [], []
    names, avail = None, None
    for fname in files:
        data = load(fname)
        arrays = data['arrays']
        if names is None:
            names = sorted(arrays)
            candidates = props or ['p', 'rho', 'u', 'v', 'w', 'vmag',
                                   'h', 'm', 'dw', 'e', 'cs']
            avail = [p for p in candidates
                     if all(hasattr(arrays[n], p) or p == 'vmag'
                            for n in names)]
        rec = {}
        for n in names:
            pa = arrays[n]
            x = np.asarray(pa.x)
            y = np.asarray(pa.y)
            z = np.asarray(getattr(pa, 'z', np.zeros_like(x)))
            rec[n] = {'x': _b64(x), 'y': _b64(y), 'z': _b64(z)}
            for p in avail:
                if p == 'vmag':
                    u = np.asarray(getattr(pa, 'u', np.zeros_like(x)))
                    v = np.asarray(getattr(pa, 'v', np.zeros_like(x)))
                    w = np.asarray(getattr(pa, 'w', np.zeros_like(x)))
                    rec[n][p] = _b64(np.sqrt(u * u + v * v + w * w))
                else:
                    rec[n][p] = _b64(np.asarray(getattr(pa, p)))
        frames.append(rec)
        times.append(float(data['solver_data'].get('t', 0.0)))

    # scene bounds from the first frame
    data0 = load(files[0])
    los = np.full(3, np.inf)
    his = np.full(3, -np.inf)
    is3d = False
    for n in names:
        pa = data0['arrays'][n]
        x = np.asarray(pa.x)
        y = np.asarray(pa.y)
        z = np.asarray(getattr(pa, 'z', np.zeros_like(x)))
        if x.size == 0:
            continue
        los = np.minimum(los, [x.min(), y.min(), z.min()])
        his = np.maximum(his, [x.max(), y.max(), z.max()])
        if np.ptp(z) > 1e-12:
            is3d = True
    center = (0.5 * (los + his)).tolist()
    radius = float(max(np.max(his - los) * 0.75, 1e-12))

    payload = {
        'frames': frames, 'names': names, 'props': avail,
        'times': times, 'center': center, 'radius': radius,
        'is3d': is3d,
        'default_prop': prop if prop in avail else
        (avail[0] if avail else 'p'),
    }
    html = _TEMPLATE.replace('__DATA__', json.dumps(payload))
    with open(out, 'w') as fp:
        fp.write(html)
    print('wrote %s (%d frames, %.1f MB)' % (
        out, len(frames), os.path.getsize(out) / 1e6))
