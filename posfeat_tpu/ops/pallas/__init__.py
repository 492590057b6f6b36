"""Pallas TPU kernels for ops whose XLA formulation is HBM-bound.

Design policy: convs and large matmuls stay in XLA (the MXU paths the
compiler already schedules optimally); Pallas is used where fusion across
ops eliminates materialization XLA would keep — e.g. the stage-2
REINFORCE reduction over the m×n match volume (reinforce.py).
"""
