from efgh_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from efgh_tpu.train.loop import make_eval_step, make_train_step, test, train, validate
from efgh_tpu.train.metrics import AverageMeter, Err, Lss
from efgh_tpu.train.state import TrainState, create_optimizer, create_state, param_count
