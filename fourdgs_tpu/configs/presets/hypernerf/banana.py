# parity: arguments/hypernerf/banana.py
_base_ = "./default.py"
