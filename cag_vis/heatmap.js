// Radial heatmap renderer (SVG, no dependencies).
//
// Functional re-implementation of the reference's d3-ez-style stack
// (HeatmapRadial.js / HeatmapRing.js / CircularRingLabels.js /
// CircularSectorLabels.js / dataTransform.js): the polar JSON
// {rad, theta, angles, vals} becomes rings (one per unique radius, inner to
// outer) of arc segments (one per theta), colored by a per-metric
// threshold scale (ReactHeatmap.js:185-195), with ring/sector labels,
// mouseover dispatch and click-to-save.

export const METRIC_SCALES = {
  // thresholds per ReactHeatmap.js:185-195
  PSNR: { domain: [15, 50], reverse: false },
  "SSIM-ct": { domain: [0.92, 1], reverse: false },
  "SSIM-lca": { domain: [0.7, 1], reverse: false },
  "SSIM-background": { domain: [0.3, 1], reverse: false },
  "DICE 2D": { domain: [0.8, 1], reverse: false },
  LPIPS: { domain: [0, 1], reverse: true }, // lower is better
  DISTS: { domain: [0, 1], reverse: true },
};

export function metricScale(metric, sparsity, background) {
  if (metric === "SSIM") {
    if (background === "background") return METRIC_SCALES["SSIM-background"];
    return METRIC_SCALES[`SSIM-${sparsity}`] || METRIC_SCALES["SSIM-ct"];
  }
  return METRIC_SCALES[metric] || { domain: [0, 1], reverse: false };
}

// viridis-like colormap, piecewise-linear on 8 anchor colors
const VIRIDIS = [
  [68, 1, 84], [70, 50, 127], [54, 92, 141], [39, 127, 142],
  [31, 161, 135], [74, 194, 109], [159, 218, 58], [253, 231, 37],
];

export function colorFor(value, domain, reverse) {
  let t = (value - domain[0]) / (domain[1] - domain[0]);
  t = Math.max(0, Math.min(1, t));
  if (reverse) t = 1 - t;
  const x = t * (VIRIDIS.length - 1);
  const i = Math.min(Math.floor(x), VIRIDIS.length - 2);
  const f = x - i;
  const c = VIRIDIS[i].map((a, k) => Math.round(a + f * (VIRIDIS[i + 1][k] - a)));
  return `rgb(${c[0]},${c[1]},${c[2]})`;
}

// group the flat polar JSON into rings: unique radius (ascending) -> list of
// {theta, val, angles} sorted by polar theta — the reshaping getDataset does
// at ReactHeatmap.js:245-363 (incl. collapsing the rad==0 pole into a disc).
export function buildRings(json) {
  const byRad = new Map();
  for (let i = 0; i < json.rad.length; i++) {
    const r = json.rad[i];
    if (!byRad.has(r)) byRad.set(r, []);
    byRad.get(r).push({ theta: json.theta[i], val: json.vals[i], angles: json.angles[i] });
  }
  const rads = [...byRad.keys()].sort((a, b) => a - b);
  return rads.map((r) => {
    const segs = byRad.get(r);
    // average duplicates at identical theta (the pole has many)
    const byTheta = new Map();
    for (const s of segs) {
      if (!byTheta.has(s.theta)) byTheta.set(s.theta, []);
      byTheta.get(s.theta).push(s);
    }
    const cells = [...byTheta.entries()]
      .map(([theta, list]) => ({
        theta,
        val: list.reduce((a, s) => a + s.val, 0) / list.length,
        angles: list[0].angles,
      }))
      .sort((a, b) => a.theta - b.theta);
    return { rad: r, cells };
  });
}

function arcPath(cx, cy, r0, r1, a0, a1) {
  const p = (r, a) => [cx + r * Math.cos(a), cy + r * Math.sin(a)];
  const [x00, y00] = p(r0, a0);
  const [x01, y01] = p(r0, a1);
  const [x10, y10] = p(r1, a0);
  const [x11, y11] = p(r1, a1);
  const large = a1 - a0 > Math.PI ? 1 : 0;
  return (
    `M${x10},${y10} A${r1},${r1} 0 ${large} 1 ${x11},${y11} ` +
    `L${x01},${y01} A${r0},${r0} 0 ${large} 0 ${x00},${y00} Z`
  );
}

export function drawHeatmap(svg, json, scale, { onHover, onLeave } = {}) {
  svg.innerHTML = "";
  const W = svg.width.baseVal.value;
  const H = svg.height.baseVal.value;
  const cx = W / 2;
  const cy = H / 2;
  const maxR = Math.min(W, H) / 2 - 40;

  const rings = buildRings(json);
  const n = rings.length;
  const ringWidth = maxR / n;
  const ns = "http://www.w3.org/2000/svg";

  rings.forEach((ring, ri) => {
    const r0 = ri * ringWidth;
    const r1 = (ri + 1) * ringWidth - 1;
    const cells = ring.cells;
    if (cells.length === 1 || r0 === 0) {
      // pole disc
      const c = document.createElementNS(ns, "circle");
      c.setAttribute("cx", cx);
      c.setAttribute("cy", cy);
      c.setAttribute("r", Math.max(r1, 4));
      const v = cells.reduce((a, s) => a + s.val, 0) / cells.length;
      c.setAttribute("fill", colorFor(v, scale.domain, scale.reverse));
      attachEvents(c, cells[0], v, onHover, onLeave);
      svg.appendChild(c);
      return;
    }
    // segment angular extent: midpoints between sorted thetas, wrapping
    const th = cells.map((s) => s.theta);
    for (let i = 0; i < cells.length; i++) {
      const prev = i === 0 ? th[th.length - 1] - 2 * Math.PI : th[i - 1];
      const next = i === th.length - 1 ? th[0] + 2 * Math.PI : th[i + 1];
      const a0 = (th[i] + prev) / 2;
      const a1 = (th[i] + next) / 2;
      const path = document.createElementNS(ns, "path");
      path.setAttribute("d", arcPath(cx, cy, r0, r1, a0, a1));
      path.setAttribute(
        "fill", colorFor(cells[i].val, scale.domain, scale.reverse)
      );
      path.setAttribute("stroke", "#ffffff");
      path.setAttribute("stroke-width", "0.5");
      attachEvents(path, cells[i], cells[i].val, onHover, onLeave);
      svg.appendChild(path);
    }
  });

  // ring labels: the |theta| angle per ring (CircularRingLabels.js role)
  rings.forEach((ring, ri) => {
    if (!ring.cells.length) return;
    const label = document.createElementNS(ns, "text");
    label.setAttribute("x", cx + (ri + 0.5) * ringWidth);
    label.setAttribute("y", cy - 3);
    label.setAttribute("font-size", "9");
    label.setAttribute("fill", "#444");
    const a = ring.cells[0].angles;
    label.textContent = Math.abs(a[0]).toFixed(0);
    svg.appendChild(label);
  });

  drawSectorLabels(svg, rings, cx, cy, maxR);
}

// sector (phi) labels on a circular text path just outside the outer ring —
// the CircularSectorLabels.js:27-90 role. One label per outer-ring segment,
// anchored at the segment's mid-angle via textPath startOffset.
export function drawSectorLabels(svg, rings, cx, cy, maxR) {
  const ns = "http://www.w3.org/2000/svg";
  const outer = rings[rings.length - 1];
  if (!outer || outer.cells.length < 2) return;
  const r = maxR + 12;
  let defs = svg.querySelector("defs");
  if (!defs) {
    defs = document.createElementNS(ns, "defs");
    svg.appendChild(defs);
  }
  // full-circle path starting at angle 0 (3 o'clock), sweeping clockwise in
  // screen space (same direction arcPath draws segments)
  const pathId = `sector-label-circle-${Math.round(r)}`;
  const circ = document.createElementNS(ns, "path");
  circ.setAttribute("id", pathId);
  circ.setAttribute(
    "d",
    `M${cx + r},${cy} A${r},${r} 0 1 1 ${cx - r},${cy} ` +
    `A${r},${r} 0 1 1 ${cx + r},${cy}`
  );
  circ.setAttribute("fill", "none");
  defs.appendChild(circ);
  const circumference = 2 * Math.PI * r;
  for (const cell of outer.cells) {
    const frac = ((cell.theta % (2 * Math.PI)) + 2 * Math.PI) % (2 * Math.PI) / (2 * Math.PI);
    const text = document.createElementNS(ns, "text");
    text.setAttribute("font-size", "10");
    text.setAttribute("fill", "#666");
    const tp = document.createElementNS(ns, "textPath");
    tp.setAttribute("href", `#${pathId}`);
    tp.setAttribute("startOffset", `${frac * circumference}`);
    tp.setAttribute("text-anchor", "middle");
    tp.textContent = Number(cell.angles[1]).toFixed(0);
    text.appendChild(tp);
    svg.appendChild(text);
  }
}

function attachEvents(el, cell, value, onHover, onLeave) {
  el.style.cursor = "pointer";
  el.addEventListener("mouseenter", () => {
    el.setAttribute("opacity", "0.75");
    if (onHover) onHover(cell.angles, value);
  });
  el.addEventListener("mouseleave", () => {
    el.removeAttribute("opacity");
    if (onLeave) onLeave();
  });
}

export function drawLegend(svg, scale, metric) {
  svg.innerHTML = "";
  const ns = "http://www.w3.org/2000/svg";
  const H = svg.height.baseVal.value;
  const steps = 64;
  const barH = H - 60;
  for (let i = 0; i < steps; i++) {
    const rect = document.createElementNS(ns, "rect");
    const t = i / (steps - 1);
    const v = scale.domain[0] + (scale.domain[1] - scale.domain[0]) * t;
    rect.setAttribute("x", 14);
    rect.setAttribute("y", 30 + barH * (1 - t) - barH / steps);
    rect.setAttribute("width", 24);
    rect.setAttribute("height", Math.ceil(barH / steps) + 1);
    rect.setAttribute("fill", colorFor(v, scale.domain, scale.reverse));
    svg.appendChild(rect);
  }
  const mk = (y, text) => {
    const t = document.createElementNS(ns, "text");
    t.setAttribute("x", 42);
    t.setAttribute("y", y);
    t.setAttribute("font-size", "11");
    t.textContent = text;
    svg.appendChild(t);
  };
  mk(34, scale.domain[1]);
  mk(30 + barH, scale.domain[0]);
  const title = document.createElementNS(ns, "text");
  title.setAttribute("x", 10);
  title.setAttribute("y", 16);
  title.setAttribute("font-size", "12");
  title.setAttribute("font-weight", "600");
  title.textContent = metric;
  svg.appendChild(title);
}

// click-to-save: serialize the SVG to a PNG (save-svg-as-png equivalent,
// ReactHeatmap.js:236-240)
export function savePng(svg, filename) {
  const xml = new XMLSerializer().serializeToString(svg);
  const img = new Image();
  img.onload = () => {
    const canvas = document.createElement("canvas");
    canvas.width = svg.width.baseVal.value;
    canvas.height = svg.height.baseVal.value;
    const ctx = canvas.getContext("2d");
    ctx.fillStyle = "#ffffff";
    ctx.fillRect(0, 0, canvas.width, canvas.height);
    ctx.drawImage(img, 0, 0);
    const a = document.createElement("a");
    a.download = filename;
    a.href = canvas.toDataURL("image/png");
    a.click();
  };
  img.src = "data:image/svg+xml;base64," + btoa(unescape(encodeURIComponent(xml)));
}
