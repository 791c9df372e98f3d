#!/usr/bin/env python
"""Offline converter: torchvision VGG16 (+ piq LPIPS weights) -> one .npz
consumable by nerf_for_angiography_tpu.evaluation.perceptual.

Run on any machine WITH network access:
    pip install torch torchvision piq
    python tools/convert_perceptual_weights.py perceptual_weights.npz
then ship the .npz into this environment and pass its path to
``PerceptualMetrics.from_npz``.
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    arrays = {}
    conv_idx = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            w = layer.weight.detach().numpy()  # (O, I, kh, kw)
            arrays[f"conv{conv_idx}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
            arrays[f"conv{conv_idx}_b"] = layer.bias.detach().numpy()
            conv_idx += 1

    try:
        from piq import LPIPS

        lp = LPIPS()
        for i, w in enumerate(lp.weights):
            arrays[f"lpips{i}"] = w.detach().numpy().reshape(-1)
    except Exception as e:  # pragma: no cover
        print(f"piq LPIPS weights unavailable ({e}); writing uniform weights")
        for i, c in enumerate([64, 128, 256, 512, 512]):
            arrays[f"lpips{i}"] = np.full((c,), 1.0 / c, np.float32)

    try:
        from piq import DISTS

        d = DISTS()
        alphas = d.alpha.detach().numpy().reshape(-1)
        betas = d.beta.detach().numpy().reshape(-1)
        chans = [3, 64, 128, 256, 512, 512]
        o = 0
        for i, c in enumerate(chans):
            arrays[f"dists_alpha{i}"] = alphas[o : o + c]
            arrays[f"dists_beta{i}"] = betas[o : o + c]
            o += c
    except Exception as e:  # pragma: no cover
        print(f"piq DISTS weights unavailable ({e}); skipping")

    np.savez(out_path, **arrays)
    # sidecar checksum: PerceptualMetrics.from_npz verifies it when present
    # so a corrupted/mismatched bundle fails loudly instead of producing
    # silently-wrong metric values
    import hashlib

    digest = hashlib.sha256(open(out_path, "rb").read()).hexdigest()
    with open(out_path + ".sha256", "w") as f:
        f.write(digest + "\n")
    print(f"wrote {out_path} with {len(arrays)} arrays")
    print(f"sha256 {digest} (sidecar: {out_path}.sha256)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "perceptual_weights.npz")
