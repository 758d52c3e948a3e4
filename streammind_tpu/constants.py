"""Model/data constants.

Behavioral parity with the reference StreamMind constants
(/root/reference/streammind/constants.py:1-38): same token index values,
frame defaults, and serving heartbeat timings, so that prompts, datasets
and serialized artifacts remain interchangeable.
"""

# ---------------------------------------------------------------------------
# Serving plane
# ---------------------------------------------------------------------------
CONTROLLER_HEART_BEAT_EXPIRATION = 30  # seconds until a silent worker is dropped
WORKER_HEART_BEAT_INTERVAL = 15  # seconds between worker heartbeats
LOGDIR = "./log_dir"

# ---------------------------------------------------------------------------
# Video sampling
# ---------------------------------------------------------------------------
NUM_FRAMES = 8  # default uniform sample count for offline QA
MAX_FRAMES = 320000  # absolute clamp on decoded frames
NUM_FRAMES_PER_SECOND = 1  # default fps-mode sampling rate
MAX_VISION_BATCH_FRAMES = 600  # hard cap on frames fed to the vision tower
                               # (reference videollama2_arch.py:150-151)

# AnyRes grid options (rows, cols) for high-resolution image tiling.
GRIDS = [(2, 2), (1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 1)]

# ---------------------------------------------------------------------------
# Token indices
# ---------------------------------------------------------------------------
IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
VIDEO_TOKEN_INDEX = -201
AUDIO_TOKEN_INDEX = -202

MMODAL_TOKEN_INDEX = {"IMAGE": -200, "VIDEO": -201, "AUDIO": -202}
MMODAL_INDEX_TOKEN = {v: k for k, v in MMODAL_TOKEN_INDEX.items()}

DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_VIDEO_TOKEN = "<video>"
DEFAULT_AUDIO_TOKEN = "<audio>"
DEFAULT_MMODAL_TOKEN = {"IMAGE": "<image>", "VIDEO": "<video>", "AUDIO": "<audio>"}

DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
IMAGE_PLACEHOLDER = "<image-placeholder>"

# Streaming gate vocabulary: the two-way lm-head of the gate LM.  Token ids in
# the *gate* vocab (vocab_size == 2): 0 == silence, 1 == respond.  In the 7B
# tokenizer the added special tokens </silence> and </response> land at
# 32000/32001 (reference train_new_stream.py:856-858).
GATE_SILENCE = 0
GATE_RESPOND = 1
SILENCE_TOKEN = "</silence>"
RESPONSE_TOKEN = "</response>"
SILENCE_TOKEN_ID_7B = 32000
RESPONSE_TOKEN_ID_7B = 32001

# Class weights for the gate cross-entropy: (silence, respond).
# Reference builder.py:348-355 appends [0.15, 0.85] to a unit weight list.
GATE_CLASS_WEIGHTS = (0.15, 0.85)

# CLIP pixel statistics (OpenAI CLIP ViT-L/14-336 processor).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
CLIP_IMAGE_SIZE = 336
CLIP_PATCH_SIZE = 14
