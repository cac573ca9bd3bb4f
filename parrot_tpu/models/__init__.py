from parrot_tpu.models.parrot import Parrot, DecoderState  # noqa: F401
from parrot_tpu.models.samplernn import (  # noqa: F401
    SampleRNN, SampleRNNState, VocoderBatch)
from parrot_tpu.models.char2wav import Char2Wav, JointState  # noqa: F401
