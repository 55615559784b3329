# parity: arguments/dynerf/coffee_martini.py
_base_ = './default.py'
