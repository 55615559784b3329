_base_ = "./sear_steak.py"
ModelParams = dict(use_grid_pruning=True, use_isotropic_gaussian=True, use_simplified_rgb=True, sh_degree=0)
