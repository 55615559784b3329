_base_ = "./debug_test.py"
ModelParams = dict(use_grid_pruning=True)
