# parity: arguments/dynerf/flame_salmon_1.py
_base_ = './default.py'
