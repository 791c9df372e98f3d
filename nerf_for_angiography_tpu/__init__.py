"""nerf_for_angiography_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for
3D reconstruction of coronary arteries from sparse/limited-angle X-ray
angiography, with the capabilities of kirstenmaas/nerf-for-angiography.

Layer map (mirrors the reference's L1..L6, re-designed TPU-first):
  geometry/    C-arm pose math + pinhole ray generation  (ref: phantomdata/proj_helpers.py)
  models/      CPPN coordinate MLP in flax               (ref: model/CPPN.py)
  ops/         rendering core, occupancy grid, sampling  (ref: nerf/nerf_helpers*.py + nerfacc/torch_scatter)
  data/        on-device DRR datagen, transfer functions (ref: phantomdata/{cttoray,sdftoray,helpers}.py)
  parallel/    device-mesh sharding (data-parallel rays) (no reference counterpart; SURVEY.md §2 parallelism)
  training/    jitted train loop, checkpointing, logging (ref: nerf/run_nerf_acc.py)
  evaluation/  view-sweep metrics + exporters            (ref: visualization/)
  analysis/    metric plots                              (ref: analysis/analysis.py)
  utils/       VTK legacy IO, misc
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "Reconstruction":
        from .reconstruction import Reconstruction

        return Reconstruction
    if name == "train":
        from .training import train

        return train
    if name == "TrainConfig":
        from .training import TrainConfig

        return TrainConfig
    if name == "DatagenConfig":
        from .data import DatagenConfig

        return DatagenConfig
    if name == "generate_dataset":
        from .data import generate_dataset

        return generate_dataset
    raise AttributeError(name)
