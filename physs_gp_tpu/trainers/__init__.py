from .trainer import AdamTrainer, NatGradTrainer, VB_NG_Adam, lr_schedule
from .extra import LBFGSTrainer, SwitchTrainer, VB_NG_LBFGS
from .scan import adam_scan, natgrad_scan, vb_ng_adam_scan
