"""Console entry points (``umics-train``/``umics-predict``/``umics-seg-main``/
``umics-export``), also re-exported through thin wrapper scripts at the repo
root so ``python train.py`` keeps working like the reference's top-level
scripts (``/root/reference/train.py``, ``predict.py``, ``seg_main.py``,
``export_model.py``).
"""
