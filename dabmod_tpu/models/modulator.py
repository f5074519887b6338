"""The fused TPU-native DAB modulator.

This replaces the reference's Flowgraph-of-plugins executor
(src/Flowgraph.cpp, src/DabModulator.cpp:125-425) with a single pure jitted
function over a *batch* of transmission frames:

    iq, state = modulate(fic_bytes, (subch_bytes, ...), state, gains...)

All mode/ensemble-dependent tables are precomputed in NumPy at construction
and closed over as host-NumPy constants (XLA bakes them into the executable;
pre-created *device* arrays would be fetched back to the host at lowering
time, which is pathological over a tunnelled TPU); the only sequential state
is the
16-CIF time-interleaver history, the resampler overlap carries and the TF
index (TII every-other-TF toggle) -- everything else is embarrassingly
parallel over the TF axis, which is also the multi-chip sharding axis.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..config import ModSettings
from ..eti import EnsembleLayout, EtiFrameBatch
from ..ops import cplx, fec, ofdm, filters

log = logging.getLogger("dabmod.modulator")


class Modulator:
    """Compiled modulator for one (mode, ensemble layout, settings) triple."""

    def __init__(self, layout: EnsembleLayout, settings: ModSettings | None = None):
        self.layout = layout
        self.settings = s = settings or ModSettings()
        from ..ops import fft as fft_mod
        fft_mod.set_precision(s.fft_precision)
        mode = s.dab_mode if s.dab_mode else layout.dab_mode
        self.mode = mode
        self.p = p = tables.mode_params(mode)

        # fft_engine=kiss: the reference's fixed-point configuration --
        # Q1.14 output, KISS 1/N transform scaling, no GainControl, and the
        # float-only back-end stages rejected (src/DabModulator.cpp:144-263)
        self._kiss = s.fft_engine == "kiss"
        # fft_engine=dexter: same fixed-point front end, but the transform
        # and everything after it run host-side through the FPGA FFT
        # accelerator chain (io/dexter_fft.py; src/DabModulator.cpp:214-277)
        self._dexter = s.fft_engine == "dexter"
        if self._kiss or self._dexter:
            if s.filter_taps_file:
                raise ValueError("fixed point doesn't support fir filter")
            if s.poly_coef_file:
                raise ValueError("fixed point doesn't support predistortion")
            if s.output_rate != 2_048_000:
                raise ValueError("fixed point doesn't support resampler")
            if s.enable_cfr:
                raise ValueError("fixed point doesn't support CFR")
            if s.output in ("soapy", "lime", "bladerf"):
                # these drivers re-scale float samples themselves and have
                # no native fixed-point stream path
                # (ref: src/DabMod.cpp:306,326,337)
                raise ValueError(
                    f"{s.output} fixed_point unsupported")

        # --- FEC tables (bit domain is int32, see ops.fec.BIT_DTYPE) ---
        self._fic_prbs = np.asarray(
            tables.prbs_bits(p.fic_size_in).astype(np.int32))
        self._fic_nbits = p.fic_size_in * 8
        self._fic_punct = tables.puncture_plan(
            tables.fic_rules(layout.mid), p.fic_size_in * 4 + 3)
        fic_out_bytes = self._fic_punct[2]
        assert fic_out_bytes == p.fic_size_out, (fic_out_bytes, p.fic_size_out)

        self._subch_prbs = []
        self._subch_nbits = []
        self._subch_punct = []
        self._subch_masks = []
        self._subch_offsets = []
        for sub in layout.subchannels:
            n = sub.framesize
            self._subch_prbs.append(np.asarray(
                tables.prbs_bits(n).astype(np.int32)))
            self._subch_nbits.append(n * 8)
            plan = tables.puncture_plan(
                sub.rules(), n * 4 + 3, out_bytes_expected=sub.framesize_cu * 8)
            pbytes = plan[2]
            self._subch_punct.append(plan)
            self._subch_masks.append(np.asarray(
                tables.time_interleave_masks(pbytes * 8)))
            self._subch_offsets.append(sub.start_address * 64)

        self._cif_filler = np.asarray(
            tables.prbs_bits(tables.CIF_BYTES).astype(np.int32))

        # --- OFDM tables ---
        self._inv_perm = np.asarray(tables.freq_interleave_inverse(mode))
        self._ref_q = np.asarray(tables.phase_ref_eighths(mode))
        bm_src, bm_valid = tables.bin_map(mode)
        self._bin_src = np.asarray(bm_src)
        self._bin_valid = np.asarray(bm_valid.astype(np.float32))

        # Deferred frequency interleaving: the interleaver is a pure
        # carrier permutation and the differential cumsum acts per
        # carrier, so they commute -- the front end emits symbols in
        # interleaver-INPUT order and the permutation rides the fused
        # OFDM backend's composed carrier->digit gather at zero cost
        # (index-table composition), deleting the qpsk_map stage's own
        # full HBM round trip over the symbol array.  Carrier-order
        # constants (phase ref, TII, CIC) are pre-permuted here;
        # consumers that need carrier order (XLA fallback bins, the
        # kiss/dexter fixed-point chains) apply the same gather the old
        # stage paid, so they are cost-neutral.
        carrier_of_pre = np.argsort(self._inv_perm)
        self._ref_q_pre = self._ref_q[carrier_of_pre]
        self._bin_src_pre = self._inv_perm[self._bin_src]
        self._gi = tuple(np.asarray(a) for a in tables.guard_interval_tables(
            mode, s.ofdm_window_overlap))

        # --- TII ---
        if s.tii_enable:
            tii = tables.tii_symbol(
                mode, s.tii_comb, s.tii_pattern, s.tii_old_variant)
            # stored in interleaver-input order (deferred FI, above)
            self._tii_vec = tuple(
                np.asarray(p)[carrier_of_pre]
                for p in cplx.planes_from_complex(tii))
        else:
            self._tii_vec = None

        # --- CIC equalizer (deprecated USRP1/2 path,
        #     ref: src/DabModulator.cpp:154-176, src/CicEqualizer.cpp) ---
        self._cic_taps = None
        if s.cic_eq_clock_rate:
            ratio = s.cic_eq_clock_rate // s.output_rate // 4
            use = (ratio & 1) if s.cic_eq_clock_rate == 400_000_000 else True
            if use and ratio > 0:
                from ..ops.filters import cic_equalizer_taps
                taps = cic_equalizer_taps(
                    p.nb_carriers,
                    p.spacing * s.output_rate / 2_048_000.0, ratio)
                # interleaver-input order (deferred FI, above)
                self._cic_taps = np.asarray(taps)[carrier_of_pre]

        # --- FIR ---
        if s.filter_taps_file:
            if s.filter_taps_file == "default":
                taps = tables.DEFAULT_FIR_TAPS
            else:
                taps = load_fir_taps(s.filter_taps_file)
            self._fir_taps = np.asarray(taps)
        else:
            self._fir_taps = None

        # --- Resampler ---
        self._res_plan = self._poly_plan = None
        self._res_backend = None
        if s.output_rate != 2_048_000:
            mode_rs = s.resampler_mode
            if mode_rs == "auto":
                # polyphase for up/fractional ratios (the MXU-native path);
                # the freq-domain form for decimation, where matching the
                # reference's brick-wall band truncation matters
                up = s.output_rate >= 2_048_000
                mode_rs = "poly" if up else "fft"
            if mode_rs == "poly":
                self._poly_plan = filters.PolyphasePlan.create(
                    2_048_000, s.output_rate)
            else:
                self._res_plan = filters.ResamplerPlan.create(
                    2_048_000, s.output_rate, p.spacing)
        if self._poly_plan is not None:
            # fused Pallas resampler+interleave kernel (bitcast framing,
            # K=128 matmuls, single interleaved HBM write); same backend
            # gate as the OFDM kernel.  Needs the 128-sample framing.
            backend_rs = s.ofdm_backend
            if backend_rs == "auto":
                backend_rs = ("pallas" if jax.default_backend() == "tpu"
                              else "xla")
            import os
            if os.environ.get("DABMOD_DISABLE_RESAMPLER_KERNEL"):
                backend_rs = "xla"        # ops kill-switch
            if backend_rs in ("pallas", "pallas-interpret") \
                    and 128 % self._poly_plan.M == 0:
                from ..ops import resampler_kernel
                plan128 = filters.PolyphasePlan.create(
                    2_048_000, s.output_rate, block=128)
                if resampler_kernel.supports(plan128):
                    self._poly_plan = plan128
                    from ..ops import fft as fft_mod2
                    self._res_backend = \
                        resampler_kernel.build_resampler_backend(
                            plan128, precision=fft_mod2._PRECISION,
                            interpret=(backend_rs == "pallas-interpret"))

        # --- DPD ---
        self._poly_am = self._poly_pm = None
        self._lut = self._lut_scale = None
        if s.poly_coef_file:
            kind, data = load_dpd_file(s.poly_coef_file)
            if kind == "poly":
                am, pm = data
                self._poly_am = np.asarray(am)
                self._poly_pm = np.asarray(pm)
            else:
                scalefactor, lut = data
                self._lut = np.asarray(lut)
                self._lut_scale = float(scalefactor)

        # FIR taps and DPD coefficients enter the jitted step as *runtime
        # arguments* (shape-stable pytree), so an RC tapsfile/coeffile
        # reload swaps arrays without any retrace -- the jit analogue of
        # the reference's mutex-guarded coef swap (src/FIRFilter.cpp:
        # 137-140, src/MemlessPoly.cpp:192-199).  Presence (the pytree
        # structure) is fixed at construction; a reload that changes
        # shape or kind requires a rebuild (as it does in the reference).
        self._runtime_params = self._make_runtime_params()

        # --- device-side wire-format conversion (the FormatConverter,
        #     src/FormatConverter.cpp:62-206, moved on-chip: the D2H copy
        #     then moves 2-4x fewer bytes and the host writes raw bytes) ---
        # wire-format selection mirrors the reference's output_format
        # decision (src/DabMod.cpp:450-466): file s8/u8/s16 converts, the
        # sc16-native SDR devices (BladeRF, Dexter) always take s16, and
        # ZMQ follows its own configured format (an extension -- the
        # reference's ZMQ sink is f32-only)
        self._wire_fmt = None
        if s.device_format_conversion:
            if (s.output == "file"
                    and s.file_output_format in ("s16", "u8", "s8")):
                self._wire_fmt = s.file_output_format
            elif (s.output == "zmq"
                    and s.zmq_output_format in ("s16", "u8", "s8")):
                self._wire_fmt = s.zmq_output_format
            elif s.output in ("bladerf", "dexter"):
                self._wire_fmt = "s16"
        if self._kiss:
            # the kiss configuration's wire format is complexfix = Q1.14
            # int16 pairs, identical in memory to interleaved s16
            self._wire_fmt = "s16"

        # host back end applied by the runtime's fetch thread to the
        # fetched device output (None for the on-device chains).  For
        # dexter the device emits Q1.14 symbols [2, B, S, C] and the chain
        # produces the s16 wire (accelerator + wide GI + FormatConverter).
        self.host_backend = None
        if self._dexter:
            from ..io import dexter_fft
            try:
                import iio as _iio  # noqa: PLC0415
            except ImportError:
                _iio = None
            if _iio is None or not hasattr(_iio, "Context"):
                log.warning("fft_engine=dexter: vendor libiio absent -- "
                            "using the software accelerator model")
                _iio = dexter_fft.MockFftAcceleratorIio(p.spacing)
            self.host_backend = dexter_fft.DexterOfdmChain(
                p, s.ofdm_window_overlap, iio_module=_iio)
            self._wire_fmt = "s16"

        # --- fused OFDM/CFR backend (Pallas VMEM kernel on TPU) ---
        self._ofdm_backend = None
        backend = s.ofdm_backend
        if backend == "auto":
            backend = ("pallas" if jax.default_backend() == "tpu"
                       else "xla")
        if backend in ("pallas", "pallas-interpret") \
                and p.spacing % 128 == 0:
            from ..ops.ofdm_kernel import build_ofdm_backend
            self._ofdm_backend = build_ofdm_backend(
                p.spacing, s.enable_cfr, s.cfr_clip, s.cfr_error_clip,
                precision=fft_mod._PRECISION,
                interpret=(backend == "pallas-interpret"),
                carrier_map=(self._bin_src_pre, self._bin_valid))

        # f32 planes contract (see config.device_interleave): the runtime
        # writer interleaves pairs host-side at memcpy speed
        self.emits_planes = (self._wire_fmt is None
                             and not s.device_interleave
                             and not self._kiss and not self._dexter)

        # swappable time-interleaver implementation: ShardedModulator
        # substitutes the minimal-halo shard_map form under a mesh
        # (parallel/sharding.make_sharded_time_interleave)
        self._time_interleave = fec.time_interleave

        # per-stage debug tap (the reference's --enable-trace node dumps,
        # src/Flowgraph.cpp:62-70,177-194): None in production, so the
        # compiled graph carries no trace ops; modulate_traced installs a
        # collector and runs the impl eagerly
        self._tap = None

        self._modulate = jax.jit(self._modulate_impl, donate_argnums=(2,))

    # ------------------------------------------------------------------
    def _make_runtime_params(self):
        rp = {}
        if self._fir_taps is not None:
            rp["fir_taps"] = jnp.asarray(self._fir_taps)
        if self._poly_am is not None:
            rp["poly_am"] = jnp.asarray(self._poly_am)
            rp["poly_pm"] = jnp.asarray(self._poly_pm)
        if self._lut is not None:
            rp["lut"] = jnp.asarray(self._lut)
            rp["lut_scale"] = jnp.float32(self._lut_scale)
        return rp

    def update_fir_taps(self, taps) -> bool:
        """Hot-swap the FIR taps without retracing.  Returns False when the
        tap count differs from the compiled shape (rebuild required)."""
        taps = np.asarray(taps, np.float32)
        if self._fir_taps is None or taps.shape != self._fir_taps.shape:
            return False
        self._fir_taps = taps
        self._runtime_params = dict(self._runtime_params,
                                    fir_taps=jnp.asarray(taps))
        return True

    def update_dpd(self, kind: str, data) -> bool:
        """Hot-swap DPD coefficients (poly or LUT) without retracing.
        Returns False when the kind or shape differs from the compiled
        structure."""
        if kind == "poly":
            am, pm = (np.asarray(a, np.float32) for a in data)
            if self._poly_am is None or am.shape != self._poly_am.shape \
                    or pm.shape != self._poly_pm.shape:
                return False
            self._poly_am, self._poly_pm = am, pm
            self._runtime_params = dict(self._runtime_params,
                                        poly_am=jnp.asarray(am),
                                        poly_pm=jnp.asarray(pm))
            return True
        scalefactor, lut = data
        lut = np.asarray(lut)
        if self._lut is None or lut.shape != self._lut.shape:
            return False
        self._lut, self._lut_scale = lut, float(scalefactor)
        self._runtime_params = dict(self._runtime_params,
                                    lut=jnp.asarray(lut),
                                    lut_scale=jnp.float32(scalefactor))
        return True

    def refresh_runtime_params(self) -> bool:
        """Re-read taps/coef files named in settings into the runtime
        params (used when a cached compiled modulator is reactivated).
        Returns False if current file contents no longer fit the compiled
        shapes."""
        ok = True
        s = self.settings
        if s.filter_taps_file and self._fir_taps is not None:
            taps = (tables.DEFAULT_FIR_TAPS
                    if s.filter_taps_file == "default"
                    else load_fir_taps(s.filter_taps_file))
            ok = self.update_fir_taps(taps) and ok
        if s.poly_coef_file and (self._poly_am is not None
                                 or self._lut is not None):
            kind, data = load_dpd_file(s.poly_coef_file)
            ok = self.update_dpd(kind, data) and ok
        return ok

    # ------------------------------------------------------------------
    @property
    def tf_samples_out(self) -> int:
        n = self.p.tf_samples
        plan = self._poly_plan or self._res_plan
        if plan:
            n = n * plan.L // plan.M
        return n

    def init_state(self):
        """Initial sequential state (a pytree carried between batches)."""
        state = {
            "ti_history": tuple(
                jnp.zeros((15, int(m.shape[1])), jnp.int32)
                for m in self._subch_masks),
            "tf_index": jnp.zeros((), jnp.int32),
        }
        if self.settings.enable_cfr:
            # rotating MER symbol index (ref: src/OfdmGenerator.cpp:198)
            state["mer_index"] = jnp.zeros((), jnp.int32)
        if self._poly_plan:
            h2 = 2 * self._poly_plan.half
            state["res_carry"] = (jnp.zeros((h2,), jnp.float32),
                                  jnp.zeros((h2,), jnp.float32))
        elif self._res_plan:
            state["res_in_tail"] = jnp.zeros(
                (self._res_plan.fft_in // 2, 2), jnp.float32)
            state["res_out_tail"] = jnp.zeros(
                (self._res_plan.fft_out // 2, 2), jnp.float32)
        return state

    # ------------------------------------------------------------------
    def _frontend_impl(self, fic_bytes, subch_bytes, ti_history):
        """Bit-domain FEC + carrier mapping: ETI payload bytes ->
        differential-modulated carrier symbols [B, nb_symbols, C]."""
        p = self.p
        C = p.cif_count

        with jax.named_scope("fec"):
            fic_bits = fec.unpack_bits(fic_bytes)
            fic_out = fec.fec_path(fic_bits, self._fic_prbs, self._fic_nbits,
                                   self._fic_punct)

            # NOTE: a stacked [T, S, n_max] formulation of scramble/conv/TI
            # (one op set for all sub-channels) was measured 4x SLOWER on
            # the chip at 17 sub-channels -- the padded big-array passes
            # and lane-shifted slices cost more HBM traffic than the
            # per-sub-channel unroll's op-dispatch overhead.  The unroll
            # stays; see BENCH notes for the floor accounting.
            cif_parts = []
            new_hist = []
            for i in range(len(self.layout.subchannels)):
                bits = fec.unpack_bits(subch_bytes[i])
                pb = fec.fec_path(bits, self._subch_prbs[i],
                                  self._subch_nbits[i],
                                  self._subch_punct[i])
                ti, h = self._time_interleave(pb, ti_history[i],
                                              self._subch_masks[i])
                cif_parts.append(ti)
                new_hist.append(h)

            cif = fec.assemble_cif(cif_parts, self._subch_offsets,
                                   self._cif_filler)
            tf_bits = fec.block_partition(fic_out, cif, C)
            self._t("fec", tf_bits)

        with jax.named_scope("qpsk_map"):
            # NOTE deferred FI: no interleave gather here -- symbols stay
            # in interleaver-input order until the backend's composed
            # gather (or an explicit freq_interleave for the consumers
            # that need carrier order); the phase reference is the
            # pre-permuted copy so the differential cumsum matches
            q = ofdm.qpsk_phase_indices(tf_bits, p.nb_carriers)
            self._t("qpsk_map", q)
        with jax.named_scope("diff_mod"):
            phases = ofdm.diff_modulate(q, self._ref_q_pre)
            self._t("diff_mod", phases)
        with jax.named_scope("carriers"):
            out = ofdm.phases_to_carriers(phases)   # (re, im) planes
            self._t("carriers", out)
        return out, tuple(new_hist)

    def frontend(self, fic_bytes, subch_bytes, ti_history):
        """Jitted front end (exposed for stage-level validation).

        Returns symbols in CARRIER order (the external contract);
        internally the deferred-FI permutation is applied here instead of
        inside _frontend_impl -- see the deferred-FI note in __init__."""
        if not hasattr(self, "_frontend_jit"):
            def _fe(fic, subs, hist):
                syms, new_hist = self._frontend_impl(fic, subs, hist)
                return cplx.pmap(
                    lambda x: x[..., self._inv_perm], syms), new_hist
            self._frontend_jit = jax.jit(_fe)
        return self._frontend_jit(
            jnp.asarray(fic_bytes),
            tuple(jnp.asarray(x) for x in subch_bytes), ti_history)

    def _modulate_impl(self, fic_bytes, subch_bytes, state,
                       constant_gain, var_k, rparams=None):
        p = self.p
        B = fic_bytes.shape[0] // p.cif_count
        # rparams carries the hot-swappable arrays (FIR taps, DPD coefs)
        # as traced arguments; direct callers that omit it get them baked
        # as constants (identical numerics, no reload support)
        rp = self._make_runtime_params() if rparams is None else rparams

        data_syms, new_hist = self._frontend_impl(
            fic_bytes, subch_bytes, state["ti_history"])   # [B, 76, C]

        with jax.named_scope("tii_null"):
            tf_idx = state["tf_index"] + jnp.arange(B, dtype=jnp.int32)
            if self._tii_vec is not None:
                # TII in the NULL symbol of every other TF
                # (ref: src/TII.cpp:241-243)
                insert = (tf_idx % 2 == 0).astype(jnp.float32)[:, None]
                null_row = tuple(v[None, :] * insert for v in self._tii_vec)
            else:
                zero = jnp.zeros((B, p.nb_carriers), jnp.float32)
                null_row = (zero, zero)
            symbols = tuple(
                jnp.concatenate([n[:, None], d], axis=1)
                for n, d in zip(null_row, data_syms))
            if self._cic_taps is not None:
                symbols = cplx.pmap(
                    lambda x: x * self._cic_taps[None, None, :], symbols)
            self._t("tii_null", symbols)

        if self._dexter:
            # fft_engine=dexter: the transform belongs to the FPGA FFT
            # accelerator -- the device's job ends at Q1.14 carrier
            # symbols; the runtime's fetch thread runs the accelerator +
            # wide GI + s16 conversion host-side (io/dexter_fft.py,
            # src/DabModulator.cpp:214-277)
            with jax.named_scope("dexter_quantise"):
                # deferred FI: restore carrier order for the host chain
                symbols = cplx.pmap(
                    lambda x: x[..., self._inv_perm], symbols)
                out = jnp.stack(cplx.pmap(
                    lambda x: jnp.rint(x * 16384.0).astype(jnp.int32),
                    symbols))                      # [2, B, S, C]
                self._t("dexter_quantise", out)
            new_state = {"ti_history": new_hist,
                         "tf_index": state["tf_index"] + B}
            # no device clip stat: the host FormatConverter stage counts
            # (emitting one here would be re-polled over the host value,
            # runtime._fetch_loop's clip-poll cadence)
            return out, new_state, {}

        if self._kiss:
            # fft_engine=kiss: the whole back end runs in exact int16
            # arithmetic -- bit-identical to the reference's KISS chain
            # (per-stage rounding and all; ops/kiss_fixed.py), not a
            # float approximation quantised at the end.
            from ..ops import kiss_fixed
            with jax.named_scope("kiss_ifft"):
                # deferred FI: restore carrier order before bin placement
                symbols = cplx.pmap(
                    lambda x: x[..., self._inv_perm], symbols)
                qsyms = cplx.pmap(
                    lambda x: jnp.rint(x * 16384.0).astype(jnp.int32),
                    symbols)
                bins_i = ofdm.to_bins_slices(qsyms, p.nb_carriers,
                                             p.spacing)
                td_i = kiss_fixed.kiss_fft_fixed(bins_i[0], bins_i[1],
                                                 inverse=True)
                self._t("kiss_ifft", td_i)
            with jax.named_scope("guard_interval"):
                ov = self.settings.ofdm_window_overlap
                if ov == 0:
                    iq_i = ofdm.guard_interval_unwindowed(
                        td_i, p.null_size, p.sym_size)
                else:
                    iq_i = kiss_fixed.guard_interval_windowed_fixed(
                        td_i, p.null_size, p.sym_size, ov)
                self._t("guard_interval", iq_i)
            with jax.named_scope("format_convert"):
                # Q1.14 int planes -> packed i32 wire words, byte-identical
                # to interleaved s16 pairs, with no layout pass
                out = (iq_i[1] << 16) | (iq_i[0] & 0xFFFF)
            new_state = {"ti_history": new_hist,
                         "tf_index": state["tf_index"] + B}
            # the reference's kiss chain has no FormatConverter (and so
            # no clip counter); keep the stat present for RC parity
            return out, new_state, {"num_clipped": jnp.zeros((),
                                                             jnp.int32)}

        with jax.named_scope("ofdm_ifft"):
            kstats = None
            if self._ofdm_backend is not None:
                # fused VMEM kernel: IFFT (+ CFR + per-symbol statistics);
                # takes carrier-order symbols directly -- bin placement and
                # digit reorder are one composed gather inside the backend
                td, kstats = self._ofdm_backend(symbols)
            else:
                # deferred FI: the XLA fallback needs carrier order for
                # the slice-form bin placement -- this is the same gather
                # the old qpsk_map stage paid (cost-neutral)
                symbols = cplx.pmap(
                    lambda x: x[..., self._inv_perm], symbols)
                bins = ofdm.to_bins_slices(
                    symbols, p.nb_carriers, p.spacing)
                td = ofdm.ofdm_ifft(bins)        # planes [B, S, spacing]

        stats = {}
        mer_state = {}
        if self.settings.enable_cfr:
            with jax.named_scope("cfr"):
                # in-loop MER per ETSI ETR 290 Annex C on one rotating
                # symbol per TF: CFR output vs the pre-CFR symbol
                # (ref: src/OfdmGenerator.cpp:250-273).  Batched: TF b
                # inspects symbol (mer_index + 1 + b) mod S; index 0 (the
                # NULL symbol) yields no measurement.
                S = td[0].shape[1]
                mer_idx = (state["mer_index"] + 1
                           + jnp.arange(B, dtype=jnp.int32)) % S
                rows = jnp.arange(B, dtype=jnp.int32)
                if kstats is not None:
                    # the fused kernel already applied CFR; reduce its
                    # per-symbol statistics (PAPR over data symbols only,
                    # the all-zero NULL row is excluded)
                    from ..ops import ofdm_kernel as ok
                    n_data = (S - 1) * td[0].shape[2]
                    stats["cfr_clip"] = kstats[..., ok.ST_NCLIP].sum(
                        axis=1).astype(jnp.int32)
                    stats["cfr_errclip"] = kstats[..., ok.ST_NERRCLIP].sum(
                        axis=1).astype(jnp.int32)
                    for key, pk, pw in (
                            ("papr_before_cfr", ok.ST_PEAK_BEFORE,
                             ok.ST_POW_BEFORE),
                            ("papr_after_cfr", ok.ST_PEAK_AFTER,
                             ok.ST_POW_AFTER)):
                        peak = jnp.max(kstats[:, 1:, pk], axis=1)
                        mean = jnp.sum(kstats[:, 1:, pw], axis=1) / n_data
                        stats[key] = 10.0 * jnp.log10(peak / mean)
                    num = kstats[rows, mer_idx, ok.ST_POW_BEFORE]
                    den = kstats[rows, mer_idx, ok.ST_MER_DEN]
                else:
                    before = td
                    td, n_clip, n_err = ofdm.cfr_one_iteration(
                        td, bins, self.settings.cfr_clip,
                        self.settings.cfr_error_clip)
                    stats["cfr_clip"] = n_clip
                    stats["cfr_errclip"] = n_err
                    # PAPR before/after CFR over the data symbols (the
                    # reference's PAPRStats blocks, src/OfdmGenerator.cpp:
                    # 234-250; the all-zero NULL symbol is excluded)
                    data = lambda t: cplx.pmap(
                        lambda x: x[:, 1:].reshape(B, -1), t)
                    stats["papr_before_cfr"] = filters.papr_db(data(before))
                    stats["papr_after_cfr"] = filters.papr_db(data(td))
                    pick = lambda t: cplx.pmap(lambda x: x[rows, mer_idx], t)
                    b_sym = pick(before)           # planes [B, spacing]
                    a_sym = pick(td)
                    num = cplx.pabs2(b_sym).sum(axis=-1)       # [B]
                    diff = (a_sym[0] - b_sym[0], a_sym[1] - b_sym[1])
                    den = cplx.pabs2(diff).sum(axis=-1)
                mer = jnp.where(
                    den > 0,
                    10.0 * jnp.log10(num / jnp.maximum(den, 1e-30)),
                    90.0)                 # clamp, ref line 269-271
                stats["mer_db"] = jnp.minimum(mer, 90.0)
                stats["mer_valid"] = mer_idx > 0
                mer_state["mer_index"] = (state["mer_index"] + B) % S

        self._t("ofdm_ifft", td)

        with jax.named_scope("gain"):
            # gains fold into the guard-interval assembly below: the
            # reduction pass stays, the separate read-modify-write
            # apply-gain pass over the full symbol array disappears
            gains = ofdm.compute_gain(
                td, self.settings.gain_mode, var_k) * constant_gain
            self._t("gain", gains)

        with jax.named_scope("guard_interval"):
            if self.settings.ofdm_window_overlap == 0:
                iq = ofdm.guard_interval_unwindowed(
                    td, p.null_size, p.sym_size, gains=gains)
            else:
                iq = ofdm.guard_interval_windowed(
                    td, p.null_size, p.sym_size,
                    self.settings.ofdm_window_overlap,
                    gains=gains)                    # planes [B, tf]
        self._t("guard_interval", iq)

        if self._fir_taps is not None:
            with jax.named_scope("fir"):
                iq = filters.fir_filter(iq, rp["fir_taps"])
                self._t("fir", iq)

        new_state = {"ti_history": new_hist,
                     "tf_index": state["tf_index"] + B, **mer_state}

        # rows_2d: the fused resampler keeps its [nb, out_block] row shape
        # (row-major == stream order); flattening to [B, N] on device is a
        # tile-row-width change, i.e. a pure relayout of the full 4x-rate
        # stream.  Downstream stages are elementwise or stack on a new
        # minor axis, so only the final host-side view reshapes.
        rows_2d = False
        if self._poly_plan:
            with jax.named_scope("resampler"):
                flat = cplx.pmap(lambda x: x.reshape(-1), iq)
                if self._res_backend is not None:
                    iq, carry = self._res_backend(flat, state["res_carry"])
                    rows_2d = True
                else:
                    y, carry = filters.resample_poly(
                        flat, self._poly_plan, state["res_carry"])
                    iq = cplx.pmap(lambda x: x.reshape(B, -1), y)
                new_state["res_carry"] = carry
        elif self._res_plan:
            with jax.named_scope("resampler"):
                # rare decimation path: the pair-domain freq resampler
                flat = cplx.planes_to_pairs(
                    cplx.pmap(lambda x: x.reshape(-1), iq))
                y, in_tail, out_tail = filters.resample(
                    flat, self._res_plan, state["res_in_tail"],
                    state["res_out_tail"])
                new_state["res_in_tail"] = in_tail
                new_state["res_out_tail"] = out_tail
                iq = tuple(y[..., k].reshape(B, -1) for k in (0, 1))
        if self._poly_plan or self._res_plan:
            self._t("resampler", iq)

        if self._poly_am is not None or self._lut is not None:
            with jax.named_scope("dpd"):
                if self._poly_am is not None:
                    iq = filters.memless_poly(
                        iq, rp["poly_am"], rp["poly_pm"])
                else:
                    iq = filters.memless_lut(iq, rp["lut"],
                                             rp["lut_scale"])
                self._t("dpd", iq)

        if self._wire_fmt == "s16":
            with jax.named_scope("format_convert"):
                # planes pack straight into i32 wire words (byte-identical
                # to interleaved int16 pairs): the planes->pairs layout
                # pass vanishes into integer arithmetic, and the D2H copy
                # takes the fast 32-bit path
                out, n_clip = filters.pack_s16_planes(iq[0], iq[1])
                stats["num_clipped"] = n_clip
                if rows_2d:
                    out = out.reshape(B, -1)
                self._t("format_convert", out)
            return out, new_state, stats

        if self._wire_fmt is None and not self.settings.device_interleave:
            # f32 planes contract: the host writer interleaves at the
            # wire boundary (runtime._fetch_loop), like the reference's
            # CPU FormatConverter.  2D-row shapes flatten as host views.
            return iq, new_state, stats

        with jax.named_scope("interleave_out"):
            # stack on a new minor axis; for the 2D-row form the flat
            # order of [nb, ob, 2] is already the pair stream, so the
            # [B, N, 2] view is a row-major-compatible reshape
            out = cplx.planes_to_pairs(iq)
            if rows_2d:
                out = out.reshape(B, -1, 2)      # [B, N, 2] wire form
        if self._wire_fmt is not None:
            with jax.named_scope("format_convert"):
                out, n_clip = filters.format_convert(out, self._wire_fmt)
                stats["num_clipped"] = n_clip
                # pack the narrow integer stream into i32 wire words: the
                # byte stream is unchanged (little-endian quads) but the
                # D2H copy takes the fast 32-bit path (the tunnelled
                # runtime moves sub-32-bit types ~100x slower)
                if out.dtype in (jnp.uint8, jnp.int8):
                    out = jax.lax.bitcast_convert_type(
                        out.reshape(*out.shape[:-2], -1, 4), jnp.int32)
                self._t("format_convert", out)
        return out, new_state, stats

    # ------------------------------------------------------------------
    def _marshal_args(self, fic_bytes, subch_bytes, state):
        """One argument-marshalling path shared by the compiled and the
        traced runs, so their contracts cannot drift."""
        s = self.settings
        return (jnp.asarray(fic_bytes),
                tuple(jnp.asarray(x) for x in subch_bytes), state,
                jnp.float32(s.normalise * s.digital_gain),
                jnp.float32(s.gain_mode_variance), self._runtime_params)

    def modulate(self, fic_bytes, subch_bytes, state):
        """Run one batch.  fic_bytes [T, fic_len] uint8, subch_bytes tuple of
        [T, framesize] uint8 with T a multiple of cif_count."""
        return self._modulate(*self._marshal_args(
            fic_bytes, subch_bytes, state))

    def modulate_eti(self, batch: EtiFrameBatch, state):
        """Convenience: modulate a parsed ETI batch."""
        return self.modulate(batch.fic, tuple(batch.subchannels), state)

    def _t(self, name, value):
        """Stage tap: no-op unless modulate_traced installed a collector.
        Tracer values are skipped so a concurrent first jit-trace of the
        (possibly cache-shared) modulator cannot leak tracers into an
        in-progress traced run."""
        if self._tap is None:
            return
        v0 = value[0] if isinstance(value, tuple) else value
        if isinstance(v0, jax.core.Tracer):
            return
        self._tap(name, value)

    # taps whose arrays live in interleaver-input order (deferred FI,
    # see __init__): restored to carrier order at dump time so the files
    # byte-compare against the reference's node dumps
    _PRE_ORDER_TAPS = frozenset(
        {"qpsk_map", "diff_mod", "carriers", "tii_null"})

    def modulate_traced(self, fic_bytes, subch_bytes, state, trace_dir):
        """Debug-tap run: modulate() semantics, executed eagerly, with
        every stage's output appended raw to `<idx>-<stage>.dat` files in
        `trace_dir` -- the analogue of the reference's --enable-trace
        per-node dumps (src/Flowgraph.cpp:62-70,177-194), for comparing
        any stage against the reference offline.

        * (re, im) plane tuples are written as interleaved pairs (the
          reference's complexf buffer bytes); deferred-FI stages are
          restored to carrier order first (_PRE_ORDER_TAPS).
        * Files are TRUNCATED on this Modulator's first write (like the
          reference's "wb" fopen at flowgraph construction) and appended
          per batch thereafter; each tap is written and released as it
          fires, so memory stays bounded at one stage.
        * The `ofdm_ifft` tap carries the OfdmGenerator *node* output --
          i.e. post-CFR when CFR is enabled -- matching the reference's
          per-node dump granularity.
        """
        import os
        os.makedirs(trace_dir, exist_ok=True)
        if not hasattr(self, "_trace_opened"):
            self._trace_opened = set()
        counter = [0]

        def dump(name, v):
            idx = counter[0]
            counter[0] += 1
            if name in self._PRE_ORDER_TAPS:
                if isinstance(v, tuple):
                    v = tuple(np.asarray(x)[..., self._inv_perm] for x in v)
                else:
                    v = np.asarray(v)[..., self._inv_perm]
            if isinstance(v, tuple) and len(v) == 2:
                re, im = (np.asarray(x) for x in v)
                a = np.stack([re, im], axis=-1)
            else:
                a = np.asarray(v)
            path = os.path.join(trace_dir, f"{idx:02d}-{name}.dat")
            mode = "ab" if path in self._trace_opened else "wb"
            self._trace_opened.add(path)
            with open(path, mode) as f:
                f.write(np.ascontiguousarray(a).tobytes())

        self._tap = dump
        try:
            result = self._modulate_impl(*self._marshal_args(
                fic_bytes, subch_bytes, state))
        finally:
            self._tap = None
        return result


# ---------------------------------------------------------------------------
# Compiled-modulator cache: RC parameter flips that rebuild the pipeline
# (tii enable, cfr clip, windowlen, gain mode, ...) reuse the previously
# compiled executable instead of paying a fresh XLA compile -- the second
# `set tii enable 1` is instant.  Keyed by (layout, every compile-relevant
# setting); runtime-argument values (digital gain, variance, FIR taps and
# DPD coef *contents*) are deliberately absent from the key.
# ---------------------------------------------------------------------------

_MODULATOR_CACHE: "OrderedDict[tuple, Modulator]" = __import__(
    "collections").OrderedDict()
_MODULATOR_CACHE_MAX = 8


def modulator_signature(layout: EnsembleLayout, s: ModSettings) -> tuple:
    """Everything the compiled graph depends on.  Keep in sync with
    Modulator.__init__: any setting read there (other than taps/coef file
    *contents*, which are runtime arguments) must appear here."""
    ntaps = 0
    if s.filter_taps_file:
        taps = (tables.DEFAULT_FIR_TAPS if s.filter_taps_file == "default"
                else load_fir_taps(s.filter_taps_file))
        ntaps = int(np.asarray(taps).size)
    dpd_sig = ()
    if s.poly_coef_file:
        kind, data = load_dpd_file(s.poly_coef_file)
        dpd_sig = ((kind, tuple(np.asarray(data[0]).shape),
                    tuple(np.asarray(data[1]).shape)) if kind == "poly"
                   else (kind, len(data[1])))
    return (layout, s.dab_mode, s.fft_precision, s.fft_engine,
            s.ofdm_backend, s.ofdm_window_overlap, s.gain_mode,
            s.enable_cfr, s.cfr_clip, s.cfr_error_clip,
            s.tii_enable, s.tii_comb, s.tii_pattern, s.tii_old_variant,
            s.cic_eq_clock_rate, s.output_rate, s.resampler_mode,
            s.device_format_conversion, s.device_interleave,
            s.output, s.file_output_format, s.zmq_output_format,
            ntaps, dpd_sig)


def get_modulator(layout: EnsembleLayout,
                  settings: ModSettings) -> "Modulator":
    """Build-or-reuse a compiled Modulator.  On a cache hit the instance
    keeps its jit executable cache (no retrace), is re-pointed at the live
    settings object (safe: key equality guarantees every compile-relevant
    field matches) and re-reads taps/coef files so a content-only change
    since it was parked is picked up."""
    key = modulator_signature(layout, settings)
    m = _MODULATOR_CACHE.get(key)
    if m is not None:
        _MODULATOR_CACHE.move_to_end(key)
        m.settings = settings
        m.refresh_runtime_params()
        m.cache_hit = True
        return m
    m = Modulator(layout, settings)
    m.cache_hit = False
    _MODULATOR_CACHE[key] = m
    while len(_MODULATOR_CACHE) > _MODULATOR_CACHE_MAX:
        _MODULATOR_CACHE.popitem(last=False)
    return m


def clear_modulator_cache():
    _MODULATOR_CACHE.clear()


def make_default_layout(mode: int = 1,
                        subch_specs=((0, 24, 0x22),)) -> EnsembleLayout:
    params = tuple(tables.SubchannelParams(sad, stl * 8, tpl)
                   for sad, stl, tpl in subch_specs)
    mid = {1: 1, 2: 2, 3: 3, 4: 0}[mode]
    return EnsembleLayout(mid, len(params), 128 if mid == 3 else 96,
                          params, tuple(range(len(params))))


def load_fir_taps(path: str) -> np.ndarray:
    """Taps file format: first line count, then one float per line
    (ref: src/FIRFilter.cpp:95-134)."""
    with open(path) as f:
        toks = f.read().split()
    n = int(toks[0])
    taps = np.array([float(t) for t in toks[1:1 + n]], dtype=np.float32)
    if taps.size != n:
        raise ValueError(f"taps file {path}: expected {n} taps, got {taps.size}")
    return taps


def load_poly_coefs(path: str):
    """Poly DPD coefficient file (format indicator 1)."""
    kind, data = load_dpd_file(path)
    if kind != "poly":
        raise ValueError("expected a poly coefficient file (format 1)")
    return data


def load_dpd_file(path: str):
    """DPD coefficient file: format 1 = odd poly with 2x5 coefs, format 2 =
    32-entry complex LUT with scale factor
    (ref: src/MemlessPoly.cpp:110-232)."""
    with open(path) as f:
        toks = f.read().split()
    kind = int(toks[0])
    if kind == 1:
        n = int(toks[1])
        if n != 5:
            raise ValueError("expected 5 AM and 5 PM coefficients")
        vals = [float(t) for t in toks[2:2 + 10]]
        return "poly", (np.array(vals[:5], np.float32),
                        np.array(vals[5:], np.float32))
    if kind == 2:
        scalefactor = float(toks[1])
        vals = [float(t) for t in toks[2:2 + 64]]
        if len(vals) != 64:
            raise ValueError("expected 32 complex LUT entries")
        lut = np.array(vals, np.float32).reshape(32, 2)
        return "lut", (scalefactor, lut)
    raise ValueError(f"unknown DPD coefficient file format {kind}")
