# parity: arguments/dnerf/jumpingjacks.py
_base_ = './dnerf_default.py'
