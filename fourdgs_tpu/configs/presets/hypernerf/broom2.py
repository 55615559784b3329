# parity: arguments/hypernerf/broom2.py
_base_ = "./default.py"
