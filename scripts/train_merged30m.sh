#!/bin/bash
# Merged30M pretraining (reference src/train_merged30m.sh): global batch
# 4096 across the pod, per-device batch 32, teacher momentum 0.99.
python -m cosmos_tpu.training.main \
    --logs-dir ./logs/ \
    --model ViT-B-16 \
    --dataset-type webdataset \
    --lr 5e-4 --warmup 2000 --epochs 32 \
    --train-data 'datasets/merged_30m/{00000..02916}.tar' \
    --train-num-samples 26899071 \
    --batch-size 32 \
    --precision amp \
    --workers 16 \
    --save-frequency 1 --log-every-n-steps 200 \
    --wd 0.5 --beta1 0.9 --beta2 0.98 --eps 1e-8 \
    --use-imagecrop-aug --global-crops-number 2 --local-crops-number 6 \
    --crop-scale 0.4 --caption-sampling-mode textcrop \
    --num-sampled-captions 8 \
    --momentum-teacher 0.99 --fix-momentum \
    --output-all --attentional-pool --cosmos \
    "$@"
