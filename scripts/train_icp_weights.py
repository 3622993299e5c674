#!/usr/bin/env python
"""Compatibility entry point mirroring the reference's `python
train_icp_weights.py` invocation (`/root/reference/mm_masking/train_icp_weights.py`).
Delegates to mm_masking_tpu.train.train_icp_weights (full CLI there)."""
from mm_masking_tpu.train.train_icp_weights import main

if __name__ == "__main__":
    main()
