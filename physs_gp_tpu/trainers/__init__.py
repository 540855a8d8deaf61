from .trainer import AdamTrainer, NatGradTrainer, VB_NG_Adam, lr_schedule
