from .losses import (
    clip_loss,
    clip_loss_multimodal,
    sigmoid_loss,
    sigmoid_loss_multimodal,
)
from .metrics import retrieval_auc, r2_score, macro_f1
