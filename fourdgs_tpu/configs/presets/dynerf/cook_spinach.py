# parity: arguments/dynerf/cook_spinach.py
_base_ = './default.py'
