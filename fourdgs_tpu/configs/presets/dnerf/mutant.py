# parity: arguments/dnerf/mutant.py
_base_ = './dnerf_default.py'
