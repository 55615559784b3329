# parity: arguments/dnerf/hellwarrior.py
_base_ = './dnerf_default.py'
