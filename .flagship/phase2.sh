#!/bin/bash
# Flagship phase 2: per-z spectral fine-tune with gate selection.
# Waits for phase1.sh to finish (it touches $W.phase1.done on exit); running
# both concurrently would race two trainers on the same workdir checkpoint.
Z="0,0.125,0.25,0.375,0.5,0.75,1,1.25,1.5,1.75,2"
W=/tmp/bpt_flagship512
while [ ! -f "$W.phase1.done" ]; do sleep 20; done
set -x
python scripts/fidelity_check.py --tile 512 --redshifts $Z --n-stack 4 \
    --n-samples 130000 --batch 66 --pk-loss-weight 2e4 --lr 1e-4 \
    --eval-every 500 --resume --workdir $W 2>&1
python scripts/fidelity_check.py --tile 512 --redshifts $Z --n-stack 4 \
    --n-samples 130000 --batch 66 --pk-loss-weight 2e4 --lr 5e-5 \
    --eval-every 250 --resume --workdir $W 2>&1
