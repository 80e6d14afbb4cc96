from videonavqa_tpu.utils.constants import *  # noqa: F401,F403
