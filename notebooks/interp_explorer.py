"""Interactive class <-> prototype explorer (self-contained HTML).

The reference ships plotly-based interactive global-explanation
explorers (reference notebooks/main_interp.py:345-648). This
environment has no plotly and no network (CDN scripts would not load),
so the explorer is a single self-contained HTML file: the virtual
weight matrix is embedded as JSON and rendered with vanilla JS —
a hoverable class x prototype heatmap, a class selector with a sorted
relevant-prototype bar list, and links into the run's prototype patch
grids when present.

Usage:
    python notebooks/interp_explorer.py --run_dir ./runs/<run> \
        [--out explorer.html]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Count-PIPNet explorer</title>
<style>
 body { font-family: sans-serif; margin: 16px; background: #fafafa; }
 #wrap { display: flex; gap: 24px; flex-wrap: wrap; }
 canvas { border: 1px solid #888; image-rendering: pixelated; }
 #tip { position: fixed; background: #222; color: #fff; padding: 4px 8px;
        border-radius: 4px; font-size: 12px; pointer-events: none;
        display: none; z-index: 10; }
 .bar { height: 18px; background: #7a3ff0; margin: 2px 0;
        color: #fff; font-size: 12px; padding: 1px 4px;
        white-space: nowrap; }
 #bars { min-width: 320px; max-width: 540px; }
 select { font-size: 14px; margin-bottom: 8px; }
 a { color: #4444cc; }
 h3 { margin: 8px 0 4px 0; }
</style></head><body>
<h2>Global explanation — class &harr; prototype virtual weights</h2>
<p>__META__</p>
<div id="tip"></div>
<div id="wrap">
 <div>
  <h3>Heatmap (hover for values, click a row to select the class)</h3>
  <canvas id="hm"></canvas>
 </div>
 <div id="bars">
  <h3>Relevant prototypes for
      <select id="cls"></select></h3>
  <div id="barlist"></div>
 </div>
</div>
<script>
const W = __WEIGHTS__;
const classNames = __CLASSES__;
const protoLinks = __PROTO_LINKS__;
const C = W.length, P = W[0].length;
const cell = Math.max(4, Math.min(18, Math.floor(900 / P)));
const cv = document.getElementById('hm');
cv.width = P * cell; cv.height = C * cell;
const ctx = cv.getContext('2d');
let wmax = 0;
for (const row of W) for (const v of row) wmax = Math.max(wmax, v);
function color(v) {
  const t = wmax > 0 ? v / wmax : 0;
  const r = Math.round(20 + 235 * t);
  const g = Math.round(20 + 60 * t);
  const b = Math.round(60 + 120 * (1 - t));
  return `rgb(${r},${g},${b})`;
}
function draw(sel) {
  for (let c = 0; c < C; c++) for (let p = 0; p < P; p++) {
    ctx.fillStyle = color(W[c][p]);
    ctx.fillRect(p * cell, c * cell, cell, cell);
  }
  if (sel >= 0) {
    ctx.strokeStyle = '#00e0ff'; ctx.lineWidth = 2;
    ctx.strokeRect(0, sel * cell, P * cell, cell);
  }
}
const tip = document.getElementById('tip');
cv.addEventListener('mousemove', e => {
  const r = cv.getBoundingClientRect();
  const p = Math.floor((e.clientX - r.left) / cell);
  const c = Math.floor((e.clientY - r.top) / cell);
  if (p < 0 || p >= P || c < 0 || c >= C) { tip.style.display = 'none';
                                            return; }
  tip.style.display = 'block';
  tip.style.left = (e.clientX + 12) + 'px';
  tip.style.top = (e.clientY + 12) + 'px';
  tip.textContent = `${classNames[c]} / P${p}: ` +
      W[c][p].toFixed(4);
});
cv.addEventListener('mouseleave', () => tip.style.display = 'none');
cv.addEventListener('click', e => {
  const r = cv.getBoundingClientRect();
  const c = Math.floor((e.clientY - r.top) / cell);
  if (c >= 0 && c < C) { selEl.value = c; render(c); }
});
const selEl = document.getElementById('cls');
classNames.forEach((n, i) => {
  const o = document.createElement('option');
  o.value = i; o.textContent = n; selEl.appendChild(o);
});
function render(c) {
  draw(c);
  const list = document.getElementById('barlist');
  list.innerHTML = '';
  const entries = W[c].map((v, p) => [p, v])
      .filter(e => e[1] > 1e-3).sort((a, b) => b[1] - a[1]);
  const m = entries.length ? entries[0][1] : 1;
  for (const [p, v] of entries) {
    const d = document.createElement('div');
    d.className = 'bar';
    d.style.width = Math.max(8, 400 * v / m) + 'px';
    const link = protoLinks[p]
        ? ` <a style="color:#cfc" href="${protoLinks[p]}">grid</a>` : '';
    d.innerHTML = `P${p} &nbsp; ${v.toFixed(3)}${link}`;
    list.appendChild(d);
  }
  if (!entries.length) list.textContent = '(no relevant prototypes)';
}
selEl.addEventListener('change', () => render(+selEl.value));
draw(-1); render(0);
</script></body></html>
"""


def build_explorer(run_dir, out_path=None, checkpoint="net_best"):
    from notebooks.main_interp import calculate_global_explanation

    expl = calculate_global_explanation(run_dir, checkpoint)
    w = np.asarray(expl["weights"], np.float64)
    C, P = w.shape

    # class names from the dataset if discoverable, else class indices
    classes = [f"class_{i}" for i in range(C)]
    try:
        from count_pipnet_tpu.data.registry import get_data
        res = get_data(expl["args"])
        if len(res[7]) == C:
            classes = list(res[7])
    except Exception:
        pass

    # per-prototype grid links (any visualised_* tree in the run dir)
    links = {}
    for p in range(P):
        hits = glob.glob(os.path.join(
            run_dir, "visualised_*", f"grid_topk_{p}.png"))
        if hits:
            links[p] = os.path.relpath(hits[0], run_dir)

    meta = (f"run: {os.path.basename(os.path.abspath(run_dir))} &mdash; "
            f"{C} classes &times; {P} prototypes, checkpoint "
            f"{checkpoint}")
    html = (_TEMPLATE
            .replace("__WEIGHTS__", json.dumps(
                [[round(float(v), 6) for v in row] for row in w]))
            .replace("__CLASSES__", json.dumps(classes))
            .replace("__PROTO_LINKS__", json.dumps(
                {str(k): v for k, v in links.items()})
                .replace('"', '"') if links else "{}")
            .replace("__META__", meta))
    out_path = out_path or os.path.join(run_dir, "explorer.html")
    with open(out_path, "w") as f:
        f.write(html)
    print(f"Interactive explorer written to {out_path}")
    return out_path


def main():
    # honor JAX_PLATFORMS=cpu even under the sitecustomize that force-
    # registers the TPU backend (single-claimer environment)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser("Interactive class<->prototype explorer")
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--checkpoint", default="net_best")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    build_explorer(args.run_dir, args.out or None, args.checkpoint)


if __name__ == "__main__":
    main()
