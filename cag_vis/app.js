// App shell: state wiring between the options panel, the radial heatmap and
// the hover image panels — the role of App.js + ReactHeatmap.js in the
// reference (cag-vis/src/App.js:10-24, ReactHeatmap.js:37-182).

import { DEFAULT_STATE, renderOptions } from "./options.js";
import {
  drawHeatmap,
  drawLegend,
  metricScale,
  savePng,
} from "./heatmap.js";

const state = { ...DEFAULT_STATE };
const statusEl = document.getElementById("status");
const svg = document.getElementById("heatmap");
const legendSvg = document.getElementById("legend");
const readout = document.getElementById("angle-readout");

// experiment-folder URL, mirroring getFetchString (ReactHeatmap.js:79-118)
// and the evaluation exporter's naming (visualization.py:594-657 /
// evaluation/heatmap.py experiment_naming).
export function buildUrl(s) {
  let experiment = s.background;
  if (s.background !== "limited-sparse" && s.samplingStrategy) {
    experiment += s.samplingStrategy;
  }
  if (s.architecture !== "4x128") {
    experiment = `architecture-${s.architecture}`;
  }
  experiment += s.sparsity === "lca" ? "-lca" : "-ct";
  const nAngles = Math.round(Math.sqrt(s.sparseAngle)) - 1;
  const expName = `${s.limitedAngle}-${nAngles}-${s.centerPoint}`;
  const file = `${s.metric}-${s.direction}-${s.firstAxis}-${s.secondAxis}.json`;
  return `${s.baseUrl}/${experiment}/${expName}/${file}`;
}

export function buildAngleUrl(s, angles) {
  let base = buildUrl(s);
  base = base.substring(0, base.lastIndexOf("/"));
  // canonical one-decimal naming shared with the exporter
  // (evaluation/heatmap.py): a raw `${angles[0]}` drops the ".0" that
  // Python float formatting emits and the hover fetch would 404
  return `${base}/${angles[0].toFixed(1)}${angles[1].toFixed(1)}.json`;
}

function paintImage(canvasId, flat) {
  const canvas = document.getElementById(canvasId);
  const n = Math.round(Math.sqrt(flat.length));
  canvas.width = n;
  canvas.height = n;
  const ctx = canvas.getContext("2d");
  const img = ctx.createImageData(n, n);
  for (let i = 0; i < flat.length; i++) {
    const v = Math.max(0, Math.min(255, Math.round(flat[i] * 255)));
    img.data[4 * i] = v;
    img.data[4 * i + 1] = v;
    img.data[4 * i + 2] = v;
    img.data[4 * i + 3] = 255;
  }
  ctx.putImageData(img, 0, 0);
}

let hoverToken = 0;
async function onHover(angles, value) {
  readout.textContent =
    `theta ${angles[0]}, phi ${angles[1]} — ${state.metric} = ${value.toFixed(4)}`;
  const token = ++hoverToken;
  try {
    const resp = await fetch(buildAngleUrl(state, angles));
    if (!resp.ok || token !== hoverToken) return;
    const data = await resp.json();
    paintImage("canvas-pred", data.pred);
    paintImage("canvas-org", data.org);
    paintImage("canvas-diff", data.diff);
  } catch (e) {
    /* image JSON missing: leave panels as-is */
  }
}

async function refresh() {
  const url = buildUrl(state);
  statusEl.textContent = `loading ${url} ...`;
  try {
    const resp = await fetch(url);
    if (!resp.ok) throw new Error(`HTTP ${resp.status}`);
    const json = await resp.json();
    const scale = metricScale(state.metric, state.sparsity, state.background);
    drawHeatmap(svg, json, scale, { onHover });
    drawLegend(legendSvg, scale, state.metric);
    statusEl.textContent =
      `${state.metric} ${state.direction} — ${json.vals.length} views`;
  } catch (e) {
    statusEl.textContent = `no data at ${url} (${e.message})`;
    svg.innerHTML = "";
  }
}

renderOptions(document.getElementById("options"), state, refresh);
document.getElementById("save-png").addEventListener("click", () => {
  savePng(svg, `heatmap-${state.metric}-${state.direction}.png`);
});
refresh();
