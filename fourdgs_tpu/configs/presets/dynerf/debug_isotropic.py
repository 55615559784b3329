_base_ = "./debug_test.py"
ModelParams = dict(use_isotropic_gaussian=True)
