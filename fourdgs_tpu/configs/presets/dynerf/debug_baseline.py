_base_ = "./debug_test.py"
