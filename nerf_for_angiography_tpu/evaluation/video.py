"""Rotation-video export (visualization/helpers.py:47-70 equivalent)."""

from __future__ import annotations

import numpy as np


def save_video(frames, path: str, fps: int = 10, quality: int = 7) -> None:
    """mp4 writer; macro_block_size matches the reference's imageio call
    (helpers.py:47-49). Gated on imageio's ffmpeg being available."""
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, quality=quality, macro_block_size=10)
    except Exception as e:  # pragma: no cover - env without ffmpeg
        print(f"video export skipped ({e})")


def get_videos(
    rows: list[dict], title: str, img_width: int, img_height: int, out_dir: str
) -> None:
    """gt/pred/diff/binary rotation videos from sweep rows
    (helpers.py:51-70). ``rows`` need org_img/pred_img/binary_pred_img."""
    to_u8 = lambda im: (255 * np.clip(im, 0, 1)).astype(np.uint8)  # noqa: E731
    gt, pred, diff, binp = [], [], [], []
    for row in rows:
        g = np.asarray(row["org_img"]).reshape(img_width, img_height)
        p = np.asarray(row["pred_img"]).reshape(img_width, img_height)
        b = np.asarray(row["binary_pred_img"]).reshape(img_width, img_height)
        gt.append(to_u8(g))
        pred.append(to_u8(p))
        diff.append(to_u8(np.abs(g - p)))
        binp.append(to_u8(b))
    save_video(gt, f"{out_dir}/{title}-gt.mp4")
    save_video(pred, f"{out_dir}/{title}-pred.mp4")
    save_video(diff, f"{out_dir}/{title}-diff.mp4")
    save_video(binp, f"{out_dir}/{title}-binary.mp4")
