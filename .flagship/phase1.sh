#!/bin/bash
# Flagship 512^2 / 11-z CVAE — phase 1: ELBO-only convergence (2 x 200k samples)
set -x
Z="0,0.125,0.25,0.375,0.5,0.75,1,1.25,1.5,1.75,2"
W=/tmp/bpt_flagship512
rm -f "$W.phase1.done"
python scripts/fidelity_check.py --tile 512 --redshifts $Z --n-stack 4 \
    --n-samples 200000 --batch 24 --workdir $W 2>&1
python scripts/fidelity_check.py --tile 512 --redshifts $Z --n-stack 4 \
    --n-samples 200000 --batch 24 --resume --workdir $W 2>&1
touch "$W.phase1.done"
