"""Reference-name → operator migration shim.

The engine's real registry is plain Python imports (an operator IS a
function in a lazy DataFrame engine — see plans/registry.py docstring). This
shim reproduces the reference's name-resolution surface
(dataflow/utils/registry.py:326-363: OPERATOR_REGISTRY.get with
difflib-based did-you-mean suggestions) so a migrating pipeline that
resolves operators by their DataFlow-MM class name keeps working.
"""

from __future__ import annotations

import difflib
from collections.abc import Callable

from dataflow_mm_spark.functions import cn_norm, dedup, evaluate, extraction
from dataflow_mm_spark.functions import normalize, quality, similarity, textanalysis
from dataflow_mm_spark.operators import (
    cep,
    conversation,
    expansion,
    filters,
    generate,
    multimodal,
    topk,
    trees,
    windows,
)

#: reference class name → engine function (the Spark-first re-expression)
OPERATOR_REGISTRY: dict[str, Callable] = {
    # prep / refine
    "Conversation2Message": conversation.assemble_messages,
    "FunctionalRefiner": filters.functional_refiner,
    "TextNormalizer": normalize.normalize_text,
    "WhisperTextNormalizer": normalize.whisper_en_normalize,
    "CNTextNormalizer": cn_norm.cn_normalize_numbers,
    "WikiQARefiner": extraction.parse_qa_blocks,
    "MCTSTreeRefiner": trees.mcts_chain_rows,
    "VisualDependencyRefinerRule": generate.batch_list_generator,
    # filters
    "RuleBaseFilter": quality.rule_base_filter,
    "ScoreFilter": filters.score_filter,
    "VideoClipScoreFilter": filters.nested_clip_filter,
    "CTCAlignmentFilter": filters.span_score_filter,
    "FailRateFilter": generate.rollout_and_judge,
    # dedup / selection
    "ImageDeduplicateFilter": dedup.minhash_lsh_dedup,
    "ImageDiversityFilter": dedup.joint_neardup_dedup,
    "KNNSimilarityFilter": similarity.knn_avg_similarity,
    "DataTailorFilter": topk.datatailor_select,
    # eval
    "GeneralTextAnswerEvaluator": evaluate.with_reward,
    # generators
    "PromptedQAGenerator": generate.prompted_generator,
    "PromptTemplatedQAGenerator": generate.templated_generator,
    "BatchVQAGenerator": generate.batch_list_generator,
    # segmentation / windows
    "VideoSceneFilter": windows.tumbling_agg,
    "SileroVADGenerator": windows.session_agg_batch,
    "TimestampChunkRowGenerator": expansion.merge_spans_capped,
    "VideoFrameSampler": expansion.sample_points,
    # multimodal plumbing
    "VisionSegCutout": multimodal.decode_and_featurize,
    # text analysis
    "LanguageIDScorer": textanalysis.lang_guess,
    "QualityScorer": textanalysis.quality_score,
    "DocumentFingerprint": textanalysis.fingerprint_md5,
    # CEP
    "RoleAlternationFilter": cep.role_violations,
    "ToolCallPairingFilter": cep.tool_pairing,
}


def get_operator(name: str) -> Callable:
    """Resolve a reference operator name; unknown names raise with
    close-match suggestions (the reference's fuzzy lookup UX)."""
    if name in OPERATOR_REGISTRY:
        return OPERATOR_REGISTRY[name]
    ci = {k.lower(): v for k, v in OPERATOR_REGISTRY.items()}
    if name.lower() in ci:
        return ci[name.lower()]
    close = difflib.get_close_matches(name, OPERATOR_REGISTRY.keys(), n=3, cutoff=0.5)
    hint = f" — did you mean {', '.join(close)}?" if close else ""
    raise KeyError(f"unknown operator {name!r}{hint}")
