_base_ = "./sear_steak.py"
ModelParams = dict(use_isotropic_gaussian=True)
