"""Stereo dialog fine-tuning CLI — parity with
`zipvoice.bin.train_zipvoice_dialog_stereo`.

Fine-tunes a (mono) ZipVoice-Dialog checkpoint into the two-channel stereo
model: the fm_decoder in/out projections are duplicated into two-stream
lists with channel-averaging weight surgery (ref checkpoint.py:175-231), and
batches alternate the 2-channel objective (CFM + speaker-exclusive energy
loss) with the mixed-mono objective (ref train_zipvoice_dialog_stereo.py:
355-358, 507).  Manifests must point at stereo wavs.
"""

from zipvoice_tpu.bin.train_zipvoice_dialog import main

if __name__ == "__main__":
    main(stereo=True)
