from .optim import build_optimizer, lr_for_epoch
from .loop import train
