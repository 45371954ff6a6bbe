from smd_tpu.codec import midi_io, note_sequence  # noqa: F401
