# parity: arguments/hypernerf/3dprinter.py
_base_ = "./default.py"
