from .diarize import cluster_speakers, convert_with_diarization, fbank  # noqa: F401
