# 300-iter smoke config (parity: arguments/dynerf/debug_test.py)
_base_ = './default.py'
ModelHiddenParams = dict(
    kplanes_config={
        'grid_dimensions': 2,
        'input_coordinate_dim': 4,
        'output_coordinate_dim': 8,
        'resolution': [16, 16, 16, 20],
    },
    multires=[1],
    defor_depth=0,
    net_width=32,
    plane_tv_weight=0.0002,
    time_smoothness_weight=0.001,
    l1_time_planes=0.0001,
    no_do=False, no_dshs=False, no_ds=False,
    empty_voxel=False, render_process=False, static_mlp=False,
)
OptimizationParams = dict(
    dataloader=True,
    iterations=300,
    batch_size=1,
    coarse_iterations=100,
    densify_until_iter=8,
    opacity_reset_interval=1000,
    opacity_threshold_coarse=0.005,
    opacity_threshold_fine_init=0.005,
    opacity_threshold_fine_after=0.005,
    pruning_interval=1000,
    densification_interval=5,
)
