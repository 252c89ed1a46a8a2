"""Experiment entry points — the rebuild of `scripts/<PDE>/<case>/*.jl`.

Each reference entry script pins constants, includes a setup, then either
trains+saves or loads+plots (e.g. KS22.jl:26-32). Here that is one CLI:

    python -m distributedconvrl_pde_control_tpu.experiments.run KS22 --train
    python -m distributedconvrl_pde_control_tpu.experiments.run KS22 --eval
    python -m distributedconvrl_pde_control_tpu.experiments.run KS500 --eval \
        --load-from runs/KS200   # zero-shot transfer (KS500.jl:21-24)
"""
