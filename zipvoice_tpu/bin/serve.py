"""TTS serving CLI: dynamic-batching HTTP server over the jitted pipeline.

Beyond the reference's CLI surface (it has no server); designed for
one-chip production serving: bucket-warmed compiled programs, batched CFG
sampling, PCM16 readbacks.

Usage:
  python -m zipvoice_tpu.bin.serve --model-dir exp/zipvoice \
      --vocoder-path vocos/pytorch_model.bin --port 8080 --warmup

  curl -X POST localhost:8080/synthesize -d '{"text": "...",
      "prompt_text": "...", "prompt_wav_b64": "<base64 wav>"}' > out.wav
"""

from __future__ import annotations

import argparse
import logging


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", type=str, default="zipvoice",
                   choices=["zipvoice", "zipvoice_distill"])
    p.add_argument("--model-dir", type=str, default=None)
    p.add_argument("--checkpoint-name", type=str, default="model.pt")
    p.add_argument("--vocoder-path", type=str, default=None)
    p.add_argument("--tokenizer", type=str, default="emilia")
    p.add_argument("--lang", type=str, default="en-us")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=30.0)
    p.add_argument("--num-step", type=int, default=None)
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--feat-scale", type=float, default=0.1)
    p.add_argument("--feat-bias", type=float, default=0.0)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8", "int8-dynamic"],
                   help="int8 linear layers: weight-only, or dynamic "
                        "(per-row activation scales, s8xs8->s32 MXU)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile the serving buckets before listening")
    p.add_argument("--allow-custom-sampling", action="store_true",
                   help="accept per-request num_step/guidance/t_shift "
                        "(each distinct tuple compiles a new program; off "
                        "by default to keep clients from driving compiles)")
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.bin.infer_zipvoice import build_pipeline
    from zipvoice_tpu.serve.server import TTSServer

    # build_pipeline already resolves --num-step/--guidance-scale against
    # the per-model defaults
    pipeline, num_step, guidance_scale = build_pipeline(args)

    if args.warmup:
        logging.info("warming serving buckets (incl. fused + batch-%d "
                     "programs)...", args.max_batch)
        pipeline.warmup(num_step=num_step, guidance_scale=guidance_scale,
                        batch_sizes=(args.max_batch,))
        logging.info("warmup done")

    server = TTSServer(
        pipeline, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        num_step=num_step, guidance_scale=guidance_scale,
        allow_custom_sampling=args.allow_custom_sampling,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
