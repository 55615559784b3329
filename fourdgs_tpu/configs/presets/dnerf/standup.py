# parity: arguments/dnerf/standup.py
_base_ = './dnerf_default.py'
