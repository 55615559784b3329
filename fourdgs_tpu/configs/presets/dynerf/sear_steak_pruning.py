_base_ = "./sear_steak.py"
ModelParams = dict(use_grid_pruning=True)
