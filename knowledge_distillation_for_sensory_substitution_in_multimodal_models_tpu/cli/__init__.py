"""CLI entry points with reference flag parity.

``train_online_kd`` <-> `distillation/*/train_online_kd.py`
``train``           <-> `distillation/baseline_*/train.py`
``evaluate_onevision`` <-> `evaluation/onevisionv3/evaluate_onevision.py`
``inference``       <-> `inference/inference.py`
"""
