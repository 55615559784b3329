# parity: arguments/dnerf/trex.py
_base_ = './dnerf_default.py'
