from dmfusion.train.losses import make_loss, qua_loss  # noqa: F401
from dmfusion.train.optim import make_optimizer, make_schedule  # noqa: F401
