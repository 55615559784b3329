# parity: arguments/hypernerf/chicken.py
_base_ = "./default.py"
