# parity: arguments/dnerf/hook.py
_base_ = './dnerf_default.py'
