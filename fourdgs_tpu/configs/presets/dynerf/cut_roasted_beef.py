# parity: arguments/dynerf/cut_roasted_beef.py
_base_ = './default.py'
