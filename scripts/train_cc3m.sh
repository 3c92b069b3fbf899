#!/bin/bash
# CC3M-recap COSMOS pretraining — TPU equivalent of the reference's
# src/train_cc3m.sh (same hyperparameters; one process per TPU host).
# On a multi-host pod slice, launch this on every host with
# COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID set (or under a TPU
# runtime that configures jax.distributed automatically).

python -m cosmos_tpu.training.main \
    --logs-dir ./logs/ \
    --model ViT-B-16 \
    --dataset-type webdataset \
    --lr 5e-4 \
    --warmup 2000 \
    --epochs 32 \
    --train-data 'datasets/cc3m_recap/cc3m-train-{0000..0575}.tar' \
    --train-num-samples 2823019 \
    --val-data 'datasets/cc3m/cc3m-validation-00{00..15}.tar' \
    --val-num-samples 13443 \
    --batch-size 64 \
    --precision amp \
    --workers 16 \
    --save-frequency 1 \
    --log-every-n-steps 200 \
    --wd 0.5 \
    --beta1 0.9 \
    --beta2 0.98 \
    --eps 1e-8 \
    --use-imagecrop-aug \
    --global-crops-number 2 \
    --local-crops-number 6 \
    --crop-scale 0.4 \
    --caption-sampling-mode textcrop \
    --num-sampled-captions 8 \
    --momentum-teacher 0.999 \
    --fix-momentum \
    --output-all \
    --attentional-pool \
    --cosmos \
    "$@"
# add --gelu-approx for ~23% faster steps (tanh GELU, from-scratch training)
