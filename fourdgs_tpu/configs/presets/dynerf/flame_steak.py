# parity: arguments/dynerf/flame_steak.py
_base_ = './default.py'
