#!/bin/bash
# Curriculum + progress-driven guidance selection (myshells/run_curri_prog.sh).
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=IWildCamIDVal --template=iwildcam_template \
  --eval-datasets=IWildCamIDVal,IWildCamID,IWildCamOOD \
  --model='ViT-B/16' --ft_data=datasets/csv/iwildcam_curriculum.csv \
  --ft_data_test=datasets/csv/iwildcam_curriculum_eval.csv \
  --data-location=datasets/data \
  --batch-size=256 --lr=1e-5 --wd=0.2 --epochs=20 \
  --curriculum --curriculum_epoch=10 --progress --progress_eval --explore \
  --exp_name=flyp_iwildcam_curri --save=checkpoints/ "$@"
