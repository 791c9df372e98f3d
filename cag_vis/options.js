// Options panel: the UI state surface of the reference's Options.js
// (cag-vis/src/components/Options.js:19-186) — sliders for limited/sparse
// projections, radio groups for sparsity, background, sampling strategy,
// architecture, metric, direction, centerpoint and axes.

export const LIMITED_VALUES = [5, 15, 30, 45, 60, 90, 180];
export const SPARSE_VALUES = [4, 9, 16, 25, 36, 49];

export const DEFAULT_STATE = {
  metric: "PSNR",
  direction: "top",
  centerPoint: "[90, 0]",
  limitedAngle: 180,
  sparseAngle: 25,
  firstAxis: "X",
  secondAxis: "Z",
  sparsity: "ct",
  background: "background",
  samplingStrategy: "",
  architecture: "4x128",
  baseUrl: "http://localhost:8080",
};

const RADIO_GROUPS = [
  { key: "sparsity", title: "Data", values: ["ct", "lca"] },
  { key: "background", title: "Projection type", values: ["background", "limited-sparse", "sparsity"] },
  { key: "samplingStrategy", title: "Sampling strategy", values: ["", "-random", "-segmentation"],
    labels: ["frangi", "random", "segmentation"] },
  { key: "architecture", title: "Architecture", values: ["4x128", "2x128", "4x64"] },
  { key: "metric", title: "Metric", values: ["PSNR", "SSIM", "DICE 2D", "LPIPS", "DISTS"] },
  { key: "direction", title: "Direction", values: ["top", "bottom"] },
  { key: "centerPoint", title: "Centerpoint", values: ["[90, 0]", "[0, 90]", "[0, 0]"] },
];

function slider(container, { title, values, key, state, onChange }) {
  const div = document.createElement("div");
  div.className = "control";
  const label = document.createElement("label");
  label.className = "title";
  const valueSpan = document.createElement("span");
  valueSpan.className = "value";
  valueSpan.textContent = state[key];
  label.textContent = title + " ";
  label.appendChild(valueSpan);
  const input = document.createElement("input");
  input.type = "range";
  input.min = 0;
  input.max = values.length - 1;
  input.step = 1;
  input.value = values.indexOf(state[key]);
  input.addEventListener("input", () => {
    state[key] = values[Number(input.value)];
    valueSpan.textContent = state[key];
    onChange();
  });
  div.appendChild(label);
  div.appendChild(input);
  container.appendChild(div);
}

function radios(container, { key, title, values, labels, state, onChange }) {
  const div = document.createElement("div");
  div.className = "control";
  const label = document.createElement("label");
  label.className = "title";
  label.textContent = title;
  div.appendChild(label);
  const row = document.createElement("div");
  row.className = "radio-row";
  values.forEach((v, i) => {
    const l = document.createElement("label");
    const r = document.createElement("input");
    r.type = "radio";
    r.name = key;
    r.checked = state[key] === v;
    r.addEventListener("change", () => {
      state[key] = v;
      onChange();
    });
    l.appendChild(r);
    l.appendChild(document.createTextNode((labels || values)[i]));
    row.appendChild(l);
  });
  div.appendChild(row);
  container.appendChild(div);
}

export function renderOptions(container, state, onChange) {
  container.innerHTML = "";
  const h = document.createElement("h1");
  h.textContent = "cag-vis";
  container.appendChild(h);

  slider(container, {
    title: "Limited projections (deg)", values: LIMITED_VALUES,
    key: "limitedAngle", state, onChange,
  });
  slider(container, {
    title: "Sparse projections (#)", values: SPARSE_VALUES,
    key: "sparseAngle", state, onChange,
  });
  for (const g of RADIO_GROUPS) {
    radios(container, { ...g, state, onChange });
  }

  const urlDiv = document.createElement("div");
  urlDiv.className = "control";
  urlDiv.innerHTML = '<label class="title">Data server</label>';
  const urlInput = document.createElement("input");
  urlInput.type = "text";
  urlInput.value = state.baseUrl;
  urlInput.style.width = "100%";
  urlInput.addEventListener("change", () => {
    state.baseUrl = urlInput.value;
    onChange();
  });
  urlDiv.appendChild(urlInput);
  container.appendChild(urlDiv);
}
