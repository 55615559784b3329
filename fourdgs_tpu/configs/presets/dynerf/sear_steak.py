# parity: arguments/dynerf/sear_steak.py (Instant4D ablation baseline)
_base_ = './default.py'
ModelParams = dict(
    use_grid_pruning=False,
    use_isotropic_gaussian=False,
    use_simplified_rgb=False,
    sh_degree=3,
)
OptimizationParams = dict(batch_size=2)
