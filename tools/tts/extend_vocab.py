"""Extend a tokenizer vocabulary with encodec audio tokens.

Capability parity with the reference ``tools/tts/extend_vocab.py``: adds
``<encodec_0> .. <encodec_1023>`` special tokens (plus prompt markers) to a
HF tokenizer and resizes the matching model embedding matrix.
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tokenizer", required=True,
                        help="local HF tokenizer path")
    parser.add_argument("--model", default=None,
                        help="optional local HF model path to resize")
    parser.add_argument("--output", required=True)
    parser.add_argument("--n-codes", type=int, default=1024)
    args = parser.parse_args()

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    new_tokens = [f"<encodec_{i}>" for i in range(args.n_codes)]
    new_tokens += ["[spk]", "[txt]", "[mel]"]
    added = tokenizer.add_tokens(new_tokens, special_tokens=True)
    tokenizer.save_pretrained(args.output)
    print(f"[extend_vocab] added {added} tokens -> {args.output}")

    if args.model:
        from transformers import AutoModelForCausalLM

        model = AutoModelForCausalLM.from_pretrained(args.model)
        model.resize_token_embeddings(len(tokenizer))
        model.save_pretrained(args.output)
        print(f"[extend_vocab] resized model embeddings to {len(tokenizer)}")


if __name__ == "__main__":
    main()
