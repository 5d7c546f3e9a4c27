from xmask3d_tpu.utils.metrics import AverageMeter, intersection_and_union  # noqa: F401
from xmask3d_tpu.utils.lr_schedule import poly_lr, cosine_lr  # noqa: F401
