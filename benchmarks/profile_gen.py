"""Profile the KV-cached generation hot loop and print an op-time breakdown.

Captures a jax.profiler perfetto trace of steady-state `generate_cached` on
GENIE_138M (the bench.py workload) and aggregates device-track slice
durations by HLO op category, so kernel-level optimization is driven by
measurement rather than guesswork (SURVEY.md §5.1, §7.8).

Usage: python benchmarks/profile_gen.py [--steps 2] [--batch 16]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(batch: int, maskgit_steps: int, logdir: str,
            serving: bool = False, attn_impl: str = "auto",
            unroll_frames: bool = False, prefill_attn_impl: str = None,
            flax_prefill: bool = False, fused: bool = False):
    import functools

    import jax
    import jax.numpy as jnp

    try:  # share bench.py's persistent compile cache (the fused program is
        # byte-identical to bench.py's -> instant warmup)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo_root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tpu1x.model_zoo import genie_138m
    from tpu1x.models.sampler import generate_cached, generate_cached_fused
    from tpu1x.models.st_maskgit import STMaskGIT

    config = genie_138m()
    model = STMaskGIT(config)
    num_prompt = 8
    num_new = config.T - num_prompt

    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, config.T * config.S), dtype=jnp.int32)
    params = model.init(rng, dummy, dummy)["params"]
    prompt = jax.random.randint(
        jax.random.PRNGKey(1), (batch, num_prompt * config.S), 0,
        config.image_vocab_size, dtype=jnp.int32)

    if fused:
        if flax_prefill or unroll_frames:
            print("warning: --fused profiles generate_cached_fused; "
                  "--flax_prefill/--unroll_frames are ignored",
                  file=sys.stderr)
        serving = True
    if serving:  # the serving DecodeEngine path
        from tpu1x.serving import DecodeEngine, prepare_serving_params
        params = prepare_serving_params(params)
        engine = DecodeEngine(config, attn_impl=attn_impl,
                              prefill_attn_impl=prefill_attn_impl)

    @jax.jit
    def gen(params, prompt, rng):
        if fused:  # the exact bench.py program
            return generate_cached_fused(
                functools.partial(engine.prefill, params),
                functools.partial(engine.decode_frame, params),
                functools.partial(engine.decode_frame_pair, params),
                prompt, num_new, rng, config, maskgit_steps=maskgit_steps)
        if serving:
            if flax_prefill:
                def prefill_fn(t):
                    return model.apply({"params": params}, t,
                                       method=STMaskGIT.prefill)
            else:
                prefill_fn = functools.partial(engine.prefill, params)
            decode_fn = functools.partial(engine.decode_frame, params)
        else:
            def prefill_fn(t):
                return model.apply({"params": params}, t,
                                   method=STMaskGIT.prefill)

            def decode_fn(f, t, c):
                return model.apply({"params": params}, f, t, c,
                                   method=STMaskGIT.decode_frame)

        return generate_cached(prefill_fn, decode_fn, prompt, num_new, rng,
                               config, maskgit_steps=maskgit_steps,
                               unroll_frames=unroll_frames)

    out, _ = gen(params, prompt, jax.random.PRNGKey(2))  # compile + warmup
    jax.device_get(out)

    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    out, _ = gen(params, prompt, jax.random.PRNGKey(3))
    jax.device_get(out)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"steady-state wall: {wall*1e3:.1f} ms "
          f"({wall / (num_new * batch) * 1e3:.3f} ms/frame)", file=sys.stderr)
    return wall


def analyze(logdir: str, top: int = 40):
    import re

    paths = glob.glob(os.path.join(logdir, "**", "*.json.gz"), recursive=True)
    if not paths:
        print("no perfetto trace found under", logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # find device (TPU) track pids
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}

    # collect leaf slices only: umbrella slices (jit_..., while bodies)
    # contain their children and would double-count. Group op families by
    # stripping trailing ".N"/numeric ids so per-layer clones merge.
    slices = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        slices.append((e.get("ts", 0), e.get("dur", 0), e.get("name", "?"),
                       e.get("tid")))
    slices.sort()

    def is_parent(name):
        return name.startswith(("jit_", "jit(")) or name.startswith("while")

    def family(name):
        name = re.sub(r"\.\d+$", "", name)
        return re.sub(r"\d+$", "", name)

    by_name = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for ts, dur, name, tid in slices:
        if is_parent(name):
            continue
        fam = family(name)
        by_name[fam] += dur
        calls[fam] += 1
        total += dur
    print(f"device tracks: {[pid_names[p] for p in device_pids]}")
    print(f"total leaf device time: {total/1e3:.1f} ms")
    print(f"{'op family':<60} {'ms':>9} {'%':>6} {'calls':>7}")
    for name, dur in by_name.most_common(top):
        print(f"{name[:60]:<60} {dur/1e3:>9.2f} {dur/total*100:>6.1f} "
              f"{calls[name]:>7}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--serving", action="store_true",
                    help="profile the serving DecodeEngine path")
    ap.add_argument("--fused", action="store_true",
                    help="profile generate_cached_fused (the bench.py path)")
    ap.add_argument("--attn_impl", type=str, default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--unroll_frames", action="store_true")
    ap.add_argument("--prefill_attn_impl", type=str, default=None)
    ap.add_argument("--flax_prefill", action="store_true")
    ap.add_argument("--logdir", type=str, default=None)
    ap.add_argument("--analyze_only", type=str, default=None)
    args = ap.parse_args()
    if args.analyze_only:
        analyze(args.analyze_only)
    else:
        logdir = args.logdir or tempfile.mkdtemp(prefix="tpu1x_prof_")
        capture(args.batch, args.steps, logdir, serving=args.serving,
                attn_impl=args.attn_impl, unroll_frames=args.unroll_frames,
                prefill_attn_impl=args.prefill_attn_impl,
                flax_prefill=args.flax_prefill, fused=args.fused)
        print(f"trace in {logdir}")
        analyze(logdir)
