"""Framework utilities: checkpointing, profiling, metric logging, debugging.

The reference's auxiliary subsystems are ad-hoc (SURVEY.md section 5): print()
logging, torch state_dict checkpoints with best-file deletion, permanent
autograd anomaly detection, manual wall-clock timers. This package provides
the TPU-native equivalents as first-class components.
"""
