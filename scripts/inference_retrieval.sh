#!/bin/bash
# Zero-shot retrieval eval (reference src/inference_retrieval.sh):
# loads released COSMOS weights from HF and evaluates COCO + Flickr R@k.
python -m cosmos_tpu.training.main \
    --model ViT-B-16 \
    --huggingface-model-name cosmos_vitb16_cc3m.pt \
    --huggingface-repo-name sankim2/cosmos \
    --cosmos --output-all --attentional-pool --add-zero-attn \
    --eval-mode retrieval \
    --data-root-dir datasets/ \
    "$@"
