#!/bin/bash
# CC12M-recap COSMOS pretraining — TPU equivalent of the reference's
# src/train_cc12m.sh (same hyperparameters; one process per TPU host).
# Reference trains this on 128x A100 (global batch 4096); on TPU run one
# process per host over a pod slice with COORDINATOR_ADDRESS /
# NUM_PROCESSES / PROCESS_ID set.

python -m cosmos_tpu.training.main \
    --logs-dir ./logs/ \
    --model ViT-B-16 \
    --dataset-type webdataset \
    --lr 5e-4 \
    --warmup 2000 \
    --epochs 32 \
    --train-data 'datasets/cc12m_recap/cc12m-train-{0000..2175}.tar' \
    --train-num-samples 10010225 \
    --data-root-dir datasets/coco \
    --batch-size 32 \
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
    --momentum-teacher 0.99 \
    --fix-momentum \
    --output-all \
    --attentional-pool \
    --cosmos \
    "$@"
