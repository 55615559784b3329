_base_ = "./debug_test.py"
ModelParams = dict(use_simplified_rgb=True, sh_degree=0)
