"""End-to-end gene prediction pipeline (easy-predict).

Single-process, device-batched equivalent of the reference's workflow
chain (data/easypredict.sh: createdb → predictexons → reduceredundancy →
unitesetstofasta; data/predictexons.sh: extractorfs → translatenucs →
search → resultspercontig → collectoptimalset). Stage boundaries are
in-memory numpy tables instead of mmap'd DB files; contig/target/fragment
keys are assigned in input order (reference createdb with --shuffle 0).
"""

import os

import numpy as np

from ..data.submat import encode_aa
from ..io.seqdb import SeqDB, DBTYPE_AA, DBTYPE_NUCL
from ..ops.chain import collect_optimal_sets, make_potential_exon, PLUS
from ..ops.orf import OrfExtractor
from ..params import Params
from ..search.driver import SearchDriver
from ..utils import log
from .output import PredictionWriter
from .reduce import reduce_redundancy


def format_seq_id(seq_id):
    """Util::fastSeqIdToBuffer (Util.cpp:222-251)."""
    s = np.float32(seq_id)
    if s == np.float32(1.0):
        return "1.000"
    out = "0."
    if s < np.float32(0.10):
        out += "0"
    if s < np.float32(0.01):
        out += "0"
    return out + str(int(s * np.float32(1000)))


def format_evalue(e):
    """%.3E, identical to printf (Matcher.cpp:288)."""
    return "%.3E" % e


def load_sequence_input(path, default_dbtype):
    """FASTA file or MMseqs sequence-DB path."""
    if os.path.exists(f"{path}.dbtype"):
        from ..io import mmseqsdb
        return mmseqsdb.read_seqdb(path)
    return SeqDB.from_fasta(path, default_dbtype)


def load_target_input(path):
    """FASTA, MMseqs sequence DB, or MMseqs HMM-profile DB."""
    if os.path.exists(f"{path}.dbtype"):
        from ..io import mmseqsdb
        from ..io.profiledb import ProfileDB, DBTYPE_HMM_PROFILE
        if mmseqsdb.read_dbtype(path) == DBTYPE_HMM_PROFILE:
            return ProfileDB.from_db(path)
        db = mmseqsdb.read_seqdb(path)
        # remember the source so the prefilter can reuse a persisted
        # createindex artifact ({path}.kidx)
        db.source_path = str(path)
        return db
    return SeqDB.from_fasta(path, DBTYPE_AA)


class EasyPredict:
    """Runs the full pipeline and writes the four output files."""

    def __init__(self, params=None):
        self.params = params or Params()

    def run(self, contigs_path, targets_path, out_prefix, tmp_dir=None,
            contig_range=None):
        """Full easy-predict. With tmp_dir set, the DP-predictions stage
        artifact is checkpointed and reused on re-runs (the reference's
        notExists-guarded resumability, data/predictexons.sh:40-88).

        contig_range=(lo, hi) processes only that contiguous contig block
        (the multi-host data-parallel partition: per-contig results are
        independent, so partition outputs concatenate byte-identically to
        a single run -- parallel/multihost.py + mergepredictions)."""
        p = self.params
        timer = log.StageTimer()
        with timer.stage("load contigs+targets"):
            contigs = load_sequence_input(contigs_path, DBTYPE_NUCL)
            targets = load_target_input(targets_path)
        dp_ckpt = os.path.join(tmp_dir, "dp_predictions") if tmp_dir else None
        if dp_ckpt and os.path.exists(f"{dp_ckpt}.dbtype"):
            with timer.stage("resume dp_predictions"):
                from ..io import mmseqsdb
                from .dpformat import predictions_payload
                from ..cli import _parse_dp_payload
                preds_per_contig = {
                    key: _parse_dp_payload(payload)
                    for key, payload in mmseqsdb.read_db(dp_ckpt) if payload}
                log.info(f"resumed {dp_ckpt}")
        else:
            with timer.stage("predictexons"):
                preds_per_contig = self.predict_exons(contigs, targets,
                                                      contig_range)
            if dp_ckpt:
                os.makedirs(tmp_dir, exist_ok=True)
                from ..io import mmseqsdb
                from .dpformat import predictions_payload
                mmseqsdb.write_db(
                    dp_ckpt, ((ci, predictions_payload(preds_per_contig.get(ci, [])))
                              for ci in range(len(contigs))))
        writer = PredictionWriter(out_prefix, p)
        target_accs = [targets.accession(i) for i in range(len(targets))]
        # emulate the reference's DB memory layout (seq + '\n' + '\0' per
        # entry, entries adjacent): --len-scan-for-start can read past the
        # contig end (unitesetstofasta.cpp:83 with the dead clamp at :74),
        # and byte parity requires reading the same adjacent bytes
        chunks = []
        starts = []
        pos = 0
        for ci in range(len(contigs)):
            starts.append(pos)
            s = contigs.seq_bytes(ci)
            chunks.append(s + b"\n\x00")
            pos += len(s) + 2
        db_buffer = np.frombuffer(b"".join(chunks), dtype=np.uint8)
        n_written = 0
        lo, hi = contig_range if contig_range else (0, len(contigs))
        with timer.stage("reduceredundancy+write"):
            for ci in range(lo, hi):
                preds = preds_per_contig.get(ci, [])
                if not preds:
                    continue
                reps, _rows = reduce_redundancy(preds, p.overlap_allowed)
                n_written += len(reps)
                contig_len = int(contigs.lengths[ci])
                contig = db_buffer[starts[ci]:]
                contig_acc = contigs.accession(ci)
                self._write_contig(writer, reps, ci, contig_acc, target_accs,
                                   contig, contig_len, p)
        writer.close()
        log.info(f"contigs: {len(contigs)}  targets: {len(targets)}  "
                 f"predictions written: {n_written}")
        self.stage_seconds = timer.report()
        return out_prefix

    def predict_exons(self, contigs, targets, contig_range=None):
        """contig_idx -> list[Prediction] (collectoptimalset emission order)."""
        p = self.params
        lo, hi = contig_range if contig_range else (0, len(contigs))
        timer = log.StageTimer()
        extractor = OrfExtractor(p)
        # --- extractorfs + translatenucs ---
        timer_ctx = timer.stage("extractorfs+translate"); timer_ctx.__enter__()
        orf_locs = []          # global fragment records, key = index
        orf_aa = []
        orf_contig = []
        for ci in range(lo, hi):
            locs, frags = extractor.extract_contig(contigs.seq_bytes(ci), ci)
            orf_locs.extend(locs)
            orf_aa.extend(extractor.translate_fragments(frags))
            orf_contig.extend([ci] * len(locs))
        if p.reverse_fragments:
            orf_aa = [aa[::-1] for aa in orf_aa]
        timer_ctx.__exit__(None, None, None)
        log.info(f"fragments: {len(orf_aa)}")

        # --- search (prefilter + batched SW on device) ---
        from ..io.profiledb import ProfileDB
        is_profile = isinstance(targets, ProfileDB)
        if is_profile:
            # --exhaustive-search inverted profile mode
            from ..search.profile_search import ProfileSearchDriver
            with timer.stage("profile search"):
                hits = ProfileSearchDriver(p, targets).search(orf_aa)
        else:
            driver = SearchDriver(p, targets)
            if p.prefilter_mode in ("ungapped", "kmer"):
                if p.prefilter_mode == "ungapped":
                    from ..search.prefilter import UngappedPrefilter
                    pref = UngappedPrefilter(p, targets, p.min_diag_score)
                else:
                    # "kmer": the reference-default sensitivity-calibrated
                    # prefilter (byte-parity candidate sets)
                    from ..search.prefilter_kmer import ReferenceKmerPrefilter
                    pref = ReferenceKmerPrefilter(p, targets, p.min_diag_score)
                with timer.stage(f"{p.prefilter_mode} prefilter"):
                    pairs = pref.candidate_pairs(orf_aa)
                log.info(f"prefilter pairs kept: {len(pairs)}")
                with timer.stage("align"):
                    hits = driver.search(orf_aa, pair_generator=pairs)
            else:
                with timer.stage("align (exhaustive)"):
                    hits = driver.search(orf_aa)
        tot_aas = targets.total_residues()
        # profile results pass through one extra text round trip
        # (swapresults re-serializes before resultspercontig)
        seqid_rounds = 2 if is_profile else 1

        # --- resultspercontig + collectoptimalset ---
        orf_contig = np.asarray(orf_contig, dtype=np.int64)
        preds_per_contig = {}
        if len(hits) == 0:
            return preds_per_contig
        hit_contig = orf_contig[hits["orf_idx"]]
        order = np.lexsort((hits["orf_idx"], hits["target_idx"], hit_contig))
        hits = hits[order]
        hit_contig = hit_contig[order]
        timer_chain = timer.stage("collectoptimalset"); timer_chain.__enter__()
        for ci in np.unique(hit_contig):
            sel = hits[hit_contig == ci]
            groups = []
            for tk in np.unique(sel["target_idx"]):
                tsel = sel[sel["target_idx"] == tk]
                plus_exons, minus_exons = [], []
                for h in tsel:
                    loc = orf_locs[h["orf_idx"]]
                    # the reference re-parses and re-serializes the seqId text
                    # between search and resultspercontig (strtod -> float ->
                    # fastSeqIdToBuffer), which is lossy for values like
                    # 0.511 -> 0.510; replicate that one round trip
                    seq_id_text = format_seq_id(h["seq_id"])
                    for _ in range(seqid_rounds):
                        seq_id_text = format_seq_id(np.float32(float(seq_id_text)))
                    exon = make_potential_exon(
                        orf_key=int(h["orf_idx"]),
                        target_key=int(tk),
                        bit_score=int(h["bit_score"]),
                        seq_id_text=seq_id_text,
                        evalue_text=format_evalue(h["evalue"]),
                        orf_prot_start=int(h["q_start"]),
                        orf_prot_end=int(h["q_end"]),
                        target_match_start=int(h["t_start"]),
                        target_match_end=int(h["t_end"]),
                        target_len=int(h["t_len"]),
                        contig_start_before_trim=loc.from_pos,
                        contig_end_before_trim=loc.to_pos)
                    (plus_exons if exon.strand == PLUS else minus_exons).append(exon)
                groups.append((int(tk), plus_exons, minus_exons))
            preds = collect_optimal_sets(groups, tot_aas, p)
            if preds:
                preds_per_contig[int(ci)] = preds
        timer_chain.__exit__(None, None, None)
        self.predict_stage_seconds = dict(timer.stages)
        return preds_per_contig

    def _write_contig(self, writer, reps, contig_key, contig_acc, target_accs,
                      contig, contig_len, p):
        """Streaming (targetKey, lowCoord)-grouped emission, plus before
        minus per group (unitesetstofasta.cpp:449-567)."""
        i = 0
        while i < len(reps):
            j = i
            group_key = (reps[i].target_key, reps[i].low_contig_coord)
            while j < len(reps) and \
                    (reps[j].target_key, reps[j].low_contig_coord) == group_key:
                j += 1
            group = reps[i:j]
            t_acc = (str(group_key[0]) if p.write_target_key
                     else target_accs[group_key[0]])
            for pred in [g for g in group if g.strand == PLUS] + \
                        [g for g in group if g.strand != PLUS]:
                writer.write_prediction(pred, contig_key, contig_acc, t_acc,
                                        contig, contig_len)
            i = j
