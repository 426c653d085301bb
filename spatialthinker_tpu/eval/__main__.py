"""CLI: python -m spatialthinker_tpu.eval --dataset cv-bench --model <path>
--provider jax|hf|openai|anthropic --template spatial_thinker ...

Parity surface: the reference's evaluation/evals.py CLI."""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="spatial benchmark evaluation")
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--model", default="Qwen/Qwen2.5-VL-3B-Instruct")
    parser.add_argument("--provider", default="jax", choices=["jax", "hf", "openai", "anthropic"])
    parser.add_argument("--template", default="spatial_thinker")
    parser.add_argument("--num-samples", type=int, default=-1)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--max-new-tokens", type=int, default=2048)
    parser.add_argument("--output", default=None)
    parser.add_argument("--no-resume", action="store_true")
    args = parser.parse_args()

    from .harness import EvalConfig, run_evaluation

    if args.provider == "jax":
        import jax.numpy as jnp

        from transformers import AutoTokenizer

        from ..models.qwen2_5_vl.params import load_params
        from .providers import JaxProvider

        model_cfg, params = load_params(args.model, dtype=jnp.bfloat16)
        tokenizer = AutoTokenizer.from_pretrained(args.model, trust_remote_code=True)
        provider = JaxProvider(params, model_cfg, tokenizer, max_new_tokens=args.max_new_tokens)
    elif args.provider == "hf":
        from .providers import HFProvider

        provider = HFProvider(args.model, max_new_tokens=args.max_new_tokens)
    elif args.provider == "openai":
        from .providers import OpenAIProvider

        provider = OpenAIProvider(args.model, max_tokens=args.max_new_tokens)
    else:
        from .providers import AnthropicProvider

        provider = AnthropicProvider(args.model, max_tokens=args.max_new_tokens)

    output = args.output or f"eval_results/{args.dataset}_{args.provider}.json"
    summary = run_evaluation(
        provider,
        EvalConfig(
            dataset=args.dataset,
            template=args.template,
            num_samples=args.num_samples,
            batch_size=args.batch_size,
            output_file=output,
            resume=not args.no_resume,
        ),
    )
    print(summary)


if __name__ == "__main__":
    main()
