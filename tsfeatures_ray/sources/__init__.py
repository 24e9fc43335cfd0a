from .synth import transcripts_path, generate_transcripts  # noqa: F401
