# parity: arguments/dnerf/lego.py
_base_ = './dnerf_default.py'
