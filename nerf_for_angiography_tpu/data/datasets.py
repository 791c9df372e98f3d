"""Dataset synthesis and the CSV data contract.

Reproduces the reference's L1 layer (phantomdata/cttoray.py, sdftoray.py):
the C-arm angle sweep, per-view DRR + importance-weight rendering, the two
CSV artifacts with their exact schemas/separators, and — going the other
way — ``load_data``, the function the reference's training script calls but
lost (run_nerf_acc.py:82, SURVEY.md §2.9-bis); its semantics are
reconstructed from the column accesses at run_nerf_acc.py:86-124 and the
writers at cttoray.py:271-308.

TPU-first: DRRs render on device (data/drr.py); only the cold-path weight
maps (Frangi/EDT) and CSV serialization run on host.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..geometry import get_ray_values, linspace_depths, stratify_depths
from ..ops.interpolation import RegularGrid
from ..ops.sampling import RayDataset
from .drr import render_drr
from .weights import get_weighted_img


@dataclasses.dataclass(frozen=True)
class DatagenConfig:
    """Mirrors cttoray.py module constants + CLI flags (cttoray.py:16-69)."""

    limited_size: float = 360.0
    number_angles: float = 72.0
    center_point: tuple[float, float] = (90.0, 0.0)
    binary: bool = False
    sampling_strategy: str = "frangi"  # frangi | segmentation | random
    focal_length: float = 1300.0
    src_z_offset: float = 200.0  # src_pt = [0, 0, focal + offset] (cttoray.py:59)
    sample_outside: float = 210.0
    img_width: int = 100
    img_height: int = 100
    larm: float = 0.0
    custom_angle: tuple[float, float] = (135.0, 135.0)
    frangi_alpha: float = 0.5  # cttoray.py:50-52 (binary -> 12)
    frangi_beta: float = 0.5
    stratified_depths: bool = True
    mode: str = "ct"  # 'ct' | 'sdf' (DRR compositing, helpers.py:208-213)
    # camera-optimization data augmentation (cttoray.py:38-43,194-206):
    # random angular shift in degrees and translation as a fraction of the
    # max grid dimension, applied to every view except the custom test one
    max_shift_rotation: float = 0.0
    max_shift_translation: float = 0.0
    # pose-refinement scenario: emit ray origins/directions from the NOMINAL
    # (unshifted) camera while pixel values come from the shifted (true)
    # render — the mis-calibration the per-view learnable shifts must
    # recover (TrainConfig.pose_refine). Mirrors the reference carrying
    # unshifted_tform_cam2world through its data contract (cttoray.py:224-262).
    rays_from_nominal: bool = False
    # sdftoray.py differences (SURVEY.md §2.7):
    angle_mode: str = "ct"  # 'ct': centered grid (cttoray.py:88-105);
    # 'sdf': arange(0, limited+1) grid (sdftoray.py:52-54)
    per_image_normalize: bool = False  # sdftoray.py:125-127
    resize_to: tuple[int, int] | None = None  # (H, W) post-resize (sdftoray.py:132-133)

    @property
    def src_pt(self) -> np.ndarray:
        return np.array([0.0, 0.0, self.focal_length + self.src_z_offset], np.float32)

    @property
    def near_thresh(self) -> float:
        return float(self.src_pt[2] - self.sample_outside)

    @property
    def far_thresh(self) -> float:
        return float(self.src_pt[2] + self.sample_outside)

    @property
    def depth_samples_per_ray(self) -> int:
        return int(self.sample_outside * 2)  # cttoray.py:63


def angle_grid(
    limited_size: float,
    number_angles: float,
    center_point=(90.0, 0.0),
    custom_angle=(135.0, 135.0),
) -> np.ndarray:
    """The theta x phi C-arm sweep + one custom test angle.

    Ref: cttoray.py:79-105 — including its quirks, kept for data-layout
    parity: the center offset only applies to positive components, and
    angles > 180 wrap by subtracting 180 (sic, not 360).
    """
    theta_rot = center_point[0] if center_point[0] > 0 else 0.0
    phi_rot = center_point[1] if center_point[1] > 0 else 0.0
    if number_angles > 0:
        step = limited_size / number_angles
        th = np.arange(-limited_size // 2, limited_size // 2 + 1, step) + theta_rot
        ph = np.arange(-limited_size // 2, limited_size // 2 + 1, step) + phi_rot
        th[th > 180] = th[th > 180] - 180
        ph[ph > 180] = ph[ph > 180] - 180
        angles = np.array([list(v) for v in itertools.product(th, ph)])
    else:
        angles = np.array([[90.0, 0.0], [0.0, 90.0]])
    return np.append(angles, [list(custom_angle)], axis=0)


def sdf_angle_grid(
    limited_size: float, number_angles: float, custom_angle=(112.5, 112.5)
) -> np.ndarray:
    """The SDF/LCA sweep: arange(0, limited+1, step) x same + one custom
    test angle (sdftoray.py:47-57)."""
    step = limited_size / number_angles
    th = np.arange(0.0, limited_size + 1, step)
    angles = np.array([list(v) for v in itertools.product(th, th)])
    return np.append(angles, [list(custom_angle)], axis=0)


class GeneratedDataset(NamedTuple):
    """Everything L1 produces, device/host resident, pre-CSV."""

    proj: pd.DataFrame  # the cttoproj table (one row per view)
    rays: RayDataset  # dense per-ray arrays (device)
    images: np.ndarray  # (V, H, W) normalized DRRs
    weight_maps: np.ndarray  # (V, H, W) sampling weights
    angles: np.ndarray  # (V, 2) theta, phi


def generate_dataset(
    volume: RegularGrid,
    config: DatagenConfig,
    key: jax.Array | None = None,
) -> GeneratedDataset:
    """Run the full datagen sweep on device. Ref flow: cttoray.py:189-267."""
    key = jax.random.PRNGKey(0) if key is None else key
    if config.angle_mode == "sdf":
        angles = sdf_angle_grid(
            config.limited_size, config.number_angles, config.custom_angle
        )
    else:
        angles = angle_grid(
            config.limited_size,
            config.number_angles,
            config.center_point,
            config.custom_angle,
        )
    H, W = config.img_height, config.img_width
    if config.resize_to is not None and tuple(config.resize_to) != (H, W):
        # the reference's resize is only shape-consistent at identity scale
        # (sdftoray.py:40-45: new dims == original dims at grid_scaling 1/8);
        # rays are emitted on the original pixel grid.
        raise ValueError("resize_to must equal (img_height, img_width)")
    depth_base = linspace_depths(
        config.near_thresh, config.far_thresh, config.depth_samples_per_ray
    )

    # max grid dimension for translation shifts (cttoray.py:150-151)
    bounds = np.abs(
        np.concatenate(
            [
                np.asarray(volume.origin),
                np.asarray(volume.origin)
                + np.asarray(volume.spacing)
                * (np.array(volume.values.shape) - 1),
            ]
        )
    )
    max_grid_dim = float(bounds.max())

    imgs, wmaps, mats, unshifted_mats = [], [], [], []
    shifts_rot, shifts_tr = [], []
    all_origins, all_dirs = [], []
    for i, (theta, phi) in enumerate(angles):
        if config.stratified_depths:
            key, sub = jax.random.split(key)
            depth_values = stratify_depths(depth_base, sub)
        else:
            depth_values = depth_base

        # random pose shifts, excluded for the custom test view
        # (cttoray.py:194-206)
        is_test_view = i == len(angles) - 1
        if (config.max_shift_rotation > 0 or config.max_shift_translation > 0) and not is_test_view:
            key, k_rot, k_tr = jax.random.split(key, 3)
            rot_shift = np.asarray(
                jax.random.uniform(
                    k_rot, (3,),
                    minval=-config.max_shift_rotation,
                    maxval=config.max_shift_rotation,
                )
            )
            translation = (
                np.asarray(
                    jax.random.uniform(
                        k_tr, (3,),
                        minval=-config.max_shift_translation,
                        maxval=config.max_shift_translation,
                    )
                )
                * max_grid_dim
            )
        else:
            rot_shift = np.zeros(3)
            translation = np.zeros(3)
        shifts_rot.append(rot_shift)
        shifts_tr.append(translation)

        origins, directions, c2w = get_ray_values(
            float(theta) + rot_shift[0], float(phi) + rot_shift[1],
            config.larm + rot_shift[2], config.src_pt, W, H,
            config.focal_length, tuple(translation),
        )
        if rot_shift.any() or translation.any():
            nom_origins, nom_dirs, unshifted_c2w = get_ray_values(
                float(theta), float(phi), config.larm, config.src_pt, W, H,
                config.focal_length,
            )
        else:
            nom_origins, nom_dirs, unshifted_c2w = origins, directions, c2w
        img = render_drr(volume, origins, directions, depth_values, config.mode)
        img_np = np.asarray(img)
        if config.per_image_normalize:  # sdftoray.py:125-127
            img_np = img_np - img_np.min()
            if img_np.max() > 0:
                img_np = img_np / img_np.max()

        # weight map (host, cold path) — cttoray.py:210-221
        img_to_transf = img_np.copy()
        if not config.binary:
            quantile = np.percentile(img_to_transf, 10)
            img_to_transf[img_to_transf > quantile] = 1.0
        if config.sampling_strategy == "random":
            wmap = np.ones_like(img_np)
        else:
            fa = 12.0 if config.binary else config.frangi_alpha
            wmap = get_weighted_img(
                img_to_transf, fa, config.frangi_beta, config.sampling_strategy
            )

        if config.resize_to is not None:  # sdftoray.py:132-133
            nh, nw = config.resize_to
            img_np = np.asarray(
                jax.image.resize(jnp.asarray(img_np), (nh, nw), "linear")
            )
            wmap = np.asarray(
                jax.image.resize(jnp.asarray(wmap), (nh, nw), "linear")
            )

        imgs.append(img_np)
        wmaps.append(np.asarray(wmap))
        mats.append(np.asarray(c2w))
        unshifted_mats.append(np.asarray(unshifted_c2w))
        ray_o, ray_d = (
            (nom_origins, nom_dirs) if config.rays_from_nominal
            else (origins, directions)
        )
        all_origins.append(np.asarray(ray_o).reshape(-1, 3))
        all_dirs.append(np.asarray(ray_d).reshape(-1, 3))

    images = np.stack(imgs)  # (V, H, W)
    # joint normalization over ALL views (cttoray.py:265-267)
    images = images - images.min()
    mx = images.max()
    if mx > 0:
        images = images / mx
    weight_maps = np.stack(wmaps)

    V = len(angles)
    image_ids = [f"{t}-{p}".replace(".", ",") for t, p in angles]

    proj = pd.DataFrame(
        {
            "image_id": image_ids,
            "theta": angles[:, 0],
            "phi": angles[:, 1],
            "larm": [config.larm] * V,
            "theta_shift": [float(r[0]) for r in shifts_rot],
            "phi_shift": [float(r[1]) for r in shifts_rot],
            "larm_shift": [float(r[2]) for r in shifts_rot],
            "translation_x": [float(t[0]) for t in shifts_tr],
            "translation_y": [float(t[1]) for t in shifts_tr],
            "translation_z": [float(t[2]) for t in shifts_tr],
            "tform_cam2world": [m.tolist() for m in mats],
            "unshifted_tform_cam2world": [m.tolist() for m in unshifted_mats],
            "image_data": [img.tolist() for img in images],
            "image_distance_data": [w.tolist() for w in weight_maps],
            "org_img_width": [W] * V,
            "org_img_height": [H] * V,
            "focal_length": [config.focal_length] * V,
            "near_thresh": [config.near_thresh] * V,
            "far_thresh": [config.far_thresh] * V,
            "depth_sample": [config.depth_samples_per_ray] * V,
            "grid_scaling_factor": [1.0] * V,
            "depth_values": [np.asarray(depth_base).tolist()] * V,
            "src_pt_z": [float(config.src_pt[2])] * V,
        }
    )

    ii = np.broadcast_to(np.arange(W, dtype=np.int32)[None, :], (H, W)).reshape(-1)
    jj = np.broadcast_to(np.arange(H, dtype=np.int32)[:, None], (H, W)).reshape(-1)

    rays = RayDataset(
        origins=jnp.asarray(np.concatenate(all_origins), jnp.float32),
        directions=jnp.asarray(np.concatenate(all_dirs), jnp.float32),
        pixel_values=jnp.asarray(images.reshape(V, -1).reshape(-1), jnp.float32),
        weights=jnp.asarray(weight_maps.reshape(-1), jnp.float32),
        image_ids=jnp.repeat(jnp.arange(V, dtype=jnp.int32), H * W),
        x_positions=jnp.asarray(np.tile(ii, V), jnp.int32),
        y_positions=jnp.asarray(np.tile(jj, V), jnp.int32),
    )
    return GeneratedDataset(
        proj=proj, rays=rays, images=images, weight_maps=weight_maps, angles=angles
    )


# ---------------------------------------------------------------------------
# CSV contract (exact reference schemas, sep=';')
# ---------------------------------------------------------------------------


def write_proj_csv(ds: GeneratedDataset, path: str) -> None:
    """df-{file_name}-{binary}-cttoproj.csv writer (cttoray.py:271-287)."""
    ds.proj.to_csv(path, sep=";")


def write_rays_csv(ds: GeneratedDataset, path: str) -> None:
    """df-rays-{file_name}-... writer (cttoray.py:289-308)."""
    r = ds.rays
    V = len(ds.proj)
    ids = np.asarray(ds.proj["image_id"])
    df = pd.DataFrame(
        {
            "image_id": np.repeat(ids, r.num_rays // V),
            "pixel_value": np.asarray(r.pixel_values),
            "distance_pixel_value": np.asarray(r.weights),
            "x_position": np.asarray(r.x_positions),
            "y_position": np.asarray(r.y_positions),
            "ray_origins_x": np.asarray(r.origins[:, 0]),
            "ray_origins_y": np.asarray(r.origins[:, 1]),
            "ray_origins_z": np.asarray(r.origins[:, 2]),
            "ray_directions_x": np.asarray(r.directions[:, 0]),
            "ray_directions_y": np.asarray(r.directions[:, 1]),
            "ray_directions_z": np.asarray(r.directions[:, 2]),
        }
    )
    df.to_csv(path, sep=";")


def map_column_to_np(df: pd.DataFrame, column_name: str) -> np.ndarray:
    """Parse a list-valued CSV column (the reference stores images and
    matrices as stringified python lists; nerf_helpers.py:8-11 /
    proj_helpers.py:5-7). Works on both our CSVs and reference-produced
    ones."""
    from ast import literal_eval

    col = df[column_name].apply(
        lambda v: literal_eval(v) if isinstance(v, str) else v
    )
    return np.array(col.tolist())


def proj_images_from_csv(proj_csv: str) -> tuple[np.ndarray, np.ndarray]:
    """(images, weight_maps) arrays from a cttoproj CSV's image_data /
    image_distance_data columns."""
    df = pd.read_csv(proj_csv, sep=";", index_col=0)
    return map_column_to_np(df, "image_data"), map_column_to_np(
        df, "image_distance_data"
    )


def sdf_datagen_config(**kw) -> DatagenConfig:
    """LCA/SDF datagen preset (sdftoray.py:16-45): focal 4000, source at
    [0,0,4000], 1000-unit sampling band, 2000 depth samples, 150x162 images,
    uncentered angle grid, per-image normalization."""
    base = dict(
        limited_size=25.0,
        number_angles=4.0,
        focal_length=4000.0,
        src_z_offset=0.0,
        sample_outside=1000.0,
        img_width=150,
        img_height=162,
        custom_angle=(112.5, 112.5),
        mode="sdf",
        angle_mode="sdf",
        per_image_normalize=True,
        sampling_strategy="segmentation",  # apply_frangi=False (sdftoray.py:24)
    )
    base.update(kw)
    return DatagenConfig(**base)


class LoadedData(NamedTuple):
    """What the reference's (missing) load_data returned, reconstructed from
    its uses at run_nerf_acc.py:82-124."""

    proj_df: pd.DataFrame
    ray_df: pd.DataFrame
    rays: RayDataset
    focal_length: float
    near_thresh: float
    far_thresh: float
    depth_samples: int
    src_pt_z: float
    num_views: int
    rays_per_view: int


def load_data(proj_csv: str, rays_csv: str, use_native: bool = True) -> LoadedData:
    """Read the two L1 CSVs back into device-resident arrays.

    Reconstruction of the stripped ``load_data`` (run_nerf_acc.py:82):
    proj_df columns used at :120-124 (focal_length, near_thresh, far_thresh,
    depth_sample, src_pt_z); ray_df columns at :86-117 (image_id,
    ray_origins_*, ray_directions_*, x/y_position, pixel_value,
    distance_pixel_value).

    The per-ray table (the big one — tens of millions of rows for dense
    sweeps) loads through the native C++ mmap parser when available
    (nerf_for_angiography_tpu.native), falling back to pandas.
    """
    proj_df = pd.read_csv(proj_csv, sep=";", index_col=0)

    native_rows = None
    if use_native:
        from ..native import load_rays_csv

        native_rows = load_rays_csv(rays_csv)

    if native_rows is not None:
        ray_df = None
        rays = RayDataset(
            origins=jnp.asarray(native_rows["origins"]),
            directions=jnp.asarray(native_rows["directions"]),
            pixel_values=jnp.asarray(native_rows["pixel_values"]),
            weights=jnp.asarray(native_rows["weights"]),
            image_ids=jnp.asarray(native_rows["image_ids"]),
            x_positions=jnp.asarray(native_rows["x_positions"]),
            y_positions=jnp.asarray(native_rows["y_positions"]),
        )
        num_views = native_rows["num_views"]
        n_rays = rays.num_rays
    else:
        ray_df = pd.read_csv(rays_csv, sep=";", index_col=0)
        ids = ray_df["image_id"].astype(str)
        unique_ids = list(dict.fromkeys(ids))  # order-preserving
        id_to_idx = {v: i for i, v in enumerate(unique_ids)}
        image_idx = ids.map(id_to_idx).to_numpy(np.int32)

        origins = np.stack(
            [ray_df[f"ray_origins_{c}"].to_numpy(np.float32) for c in "xyz"], -1
        )
        directions = np.stack(
            [ray_df[f"ray_directions_{c}"].to_numpy(np.float32) for c in "xyz"], -1
        )
        rays = RayDataset(
            origins=jnp.asarray(origins),
            directions=jnp.asarray(directions),
            pixel_values=jnp.asarray(ray_df["pixel_value"].to_numpy(np.float32)),
            weights=jnp.asarray(ray_df["distance_pixel_value"].to_numpy(np.float32)),
            image_ids=jnp.asarray(image_idx),
            x_positions=jnp.asarray(ray_df["x_position"].to_numpy(np.int32)),
            y_positions=jnp.asarray(ray_df["y_position"].to_numpy(np.int32)),
        )
        num_views = len(unique_ids)
        n_rays = len(ray_df)
    return LoadedData(
        proj_df=proj_df,
        ray_df=ray_df,
        rays=rays,
        focal_length=float(proj_df["focal_length"].iloc[0]),
        near_thresh=float(proj_df["near_thresh"].iloc[0]),
        far_thresh=float(proj_df["far_thresh"].iloc[0]),
        depth_samples=int(proj_df["depth_sample"].iloc[0]),
        src_pt_z=float(proj_df["src_pt_z"].iloc[0]),
        num_views=num_views,
        rays_per_view=n_rays // num_views,
    )
