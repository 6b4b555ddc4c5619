"""Model-wide constants.

Behavior parity with the reference's constant set (reference:
vita/constants.py:1-14) — token sentinel ids, frame-count limits, and the
ignore index used for loss masking. Values must match exactly: the negative
sentinel ids (-200 / -500) appear inside tokenized prompts produced by
`vita_tpu.tokenization` and downstream code keys off them.
"""

# Video frame-count limits (reference: vita/constants.py:2-3).
MAX_IMAGE_LENGTH = 16
MIN_IMAGE_LENGTH = 4

# Label id that the loss ignores (reference: vita/constants.py:4).
IGNORE_INDEX = -100

# Sentinel token ids spliced into prompts at media placeholder positions
# (reference: vita/constants.py:5-6). These never reach the embedding table:
# the fusion layer expands each sentinel into the exact number of feature
# slots before anything runs on device (static shapes — a TPU requirement).
IMAGE_TOKEN_INDEX = -200
AUDIO_TOKEN_INDEX = -500

DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_VIDEO_TOKEN = "<video>"
DEFAULT_AUDIO_TOKEN = "<audio>"

# Deploy-time real vocabulary ids for the placeholder tokens, as shipped in
# the reference's deployable checkpoint (reference:
# web_demo/vllm_tools/model_weight_file/config.json:14-15; vocab 51760).
DEPLOY_IMAGE_TOKEN_ID = 51000
DEPLOY_AUDIO_TOKEN_ID = 51001
VITA_VOCAB_SIZE = 51760

# Interaction state tokens prepended to assistant turns during training
# (reference: vita/util/data_utils_video_audio_neg_frameCat.py:119-126):
#   <1> — answer the (clean) audio query
#   <2> — noisy/background audio: do not reply
#   <3> — answer the text query
STATE_TOKEN_AUDIO = "<1>"
STATE_TOKEN_NOISY = "<2>"
STATE_TOKEN_TEXT = "<3>"

# Visual tokens per 448x448 patch-image after pixel-shuffle x0.5
# (reference: internvit_encoder.py:42-53,100-106).
IMAGE_TOKENS_PER_PATCH = 256

DEFAULT_DATA_RATIO = 1.0
