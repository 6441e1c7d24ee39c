"""Companion tools: sampler (rampler equivalent), paired-end preprocessor,
and the wrapper CLI (reference: vendor/rampler, scripts/racon_preprocess.py,
scripts/racon_wrapper.py)."""
