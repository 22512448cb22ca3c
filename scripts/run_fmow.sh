#!/bin/bash
# FMoW FLYP fine-tune (README.md:54): bs256, lr 1e-5, wd 0.2, 20 epochs.
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=FMOWIDVal --template=fmow_template \
  --eval-datasets=FMOWIDVal,FMOWID,FMOWOOD \
  --model='ViT-B/16' --ft_data=datasets/csv/fmow.csv \
  --data-location=datasets/data \
  --batch-size=256 --lr=1e-5 --wd=0.2 --epochs=20 \
  --exp_name=flyp_fmow --save=checkpoints/ "$@"
