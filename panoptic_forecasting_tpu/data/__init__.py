from .cityscapes import (
    LABELS,
    TRAIN_ID_TO_ID,
    ID_TO_TRAIN_ID,
    NUM_TRAIN_CLASSES,
    NUM_STUFF_CLASSES,
    NUM_THING_CLASSES,
    train_id_color_palette,
)
from .cards import DataCard
