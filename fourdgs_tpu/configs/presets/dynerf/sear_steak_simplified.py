_base_ = "./sear_steak.py"
ModelParams = dict(use_simplified_rgb=True, sh_degree=0)
