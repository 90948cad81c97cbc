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
from dataflow_mm_spark.functions import mlphead, normalize, quality, similarity
from dataflow_mm_spark.functions import textanalysis
from dataflow_mm_spark.operators import (
    align,
    audio,
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

#: reference class name → engine function (the Spark-first re-expression).
#: Every name here is COMPLETE: either pure relational/Arrow semantics, or a
#: serving-shaped generator whose external endpoint is an explicit argument
#: (the reference likewise calls an HTTP API for these —
#: dataflow/serving/api_llm_serving_request.py).
OPERATOR_REGISTRY: dict[str, Callable] = {
    # prep / refine
    "Conversation2Message": conversation.assemble_messages,
    "FunctionalRefiner": filters.functional_refiner,
    "TextNormalizer": normalize.normalize_text,
    "WhisperTextNormalizer": normalize.whisper_en_normalize,
    "CNTextNormalizer": cn_norm.cn_normalize_numbers,
    "WikiQARefiner": extraction.parse_qa_blocks,
    "MCTSTreeRefiner": trees.mcts_chain_rows,
    "VisualDependencyRefiner": generate.batch_list_generator,
    "VisualDependencyRefinerRule": generate.batch_list_generator,  # legacy alias
    "VisualGroundingRefiner": generate.batch_list_generator,
    # filters
    "RuleBaseFilter": quality.rule_base_filter,
    "ScoreFilter": filters.score_filter,
    "VideoScoreFilter": filters.nested_clip_filter,
    "VideoClipScoreFilter": filters.nested_clip_filter,  # legacy alias
    "CTCForcedAlignmentFilter": filters.span_score_filter,
    "CTCAlignmentFilter": filters.span_score_filter,  # legacy alias
    "FailRateFilter": generate.rollout_and_judge,
    "VisionDependentFilter": generate.rollout_and_judge,
    "VideoResolutionFilter": filters.range_filter,
    "VideoInfoFilter": filters.range_filter,
    # dedup / selection
    "ImageDeduplicateFilter": dedup.minhash_lsh_dedup,
    "ImageDiversityFilter": dedup.joint_neardup_dedup,
    "ImageDuplicateFilter": dedup.simhash_neardup_pairs,
    "TextDuplicateFilter": dedup.ngram_jaccard_dedup,
    "KNNSimilarityFilter": similarity.knn_avg_similarity,
    "DataTailorFilter": topk.datatailor_select,
    # eval
    "GeneralTextAnswerEvaluator": evaluate.with_reward,
    # generators (serving endpoint = explicit argument, like the reference)
    "PromptedQAGenerator": generate.prompted_generator,
    "PromptedVQAGenerator": generate.prompted_generator,
    "PromptedAQAGenerator": generate.prompted_generator,
    "PromptedImageGenerator": generate.prompted_generator,
    "PromptedImageEditGenerator": generate.prompted_generator,
    "EvalImageGenerationGenerator": generate.prompted_generator,
    "VLMBBoxGenerator": generate.prompted_generator,
    "PersQAGenerator": generate.prompted_generator,
    "MultimodalMathGenerator": generate.prompted_generator,
    "VideoCOTQAGenerator": generate.prompted_generator,
    "VideoCaptionToQAGenerator": generate.prompted_generator,
    "VideoToCaptionGenerator": generate.prompted_generator,
    "VideoMergedCaptionGenerator": generate.prompted_generator,
    "VisualReasoningGenerator": generate.prompted_generator,
    "PromptTemplatedQAGenerator": generate.templated_generator,
    "PromptTemplatedVQAGenerator": generate.templated_generator,
    "FixPromptedVQAGenerator": generate.templated_generator,
    "BatchVQAGenerator": generate.batch_list_generator,
    # segmentation / windows
    "VideoSceneFilter": windows.tumbling_agg,
    # r5: the VAD timestamp FSM + WAV decode are real (operators/audio.py);
    # the Silero probability head is pluggable (energy probs by default)
    "SileroVADGenerator": audio.vad_spans,
    "TimestampChunkRowGenerator": expansion.merge_spans_capped,
    "VideoFrameSampler": expansion.sample_points,
    "VideoClipGenerator": expansion.explode_nested_clips,
    # multimodal plumbing (r5: mask application + BMP codec real; the YOLO
    # seg mask itself is a serving input — bbox columns stand in)
    "VisionSegCutoutRefiner": multimodal.seg_cutout,
    "VisionSegCutout": multimodal.seg_cutout,  # legacy alias
    # text analysis
    "LanguageIDScorer": textanalysis.lang_guess,
    "QualityScorer": textanalysis.quality_score,
    "DocumentFingerprint": textanalysis.fingerprint_md5,
    # CEP
    "RoleAlternationFilter": cep.role_violations,
    "ToolCallPairingFilter": cep.tool_pairing,
}

#: reference names whose SPARK side (schema, partitioning, UDF batch shape,
#: threshold filter) is implemented and tested, but whose scoring kernel is a
#: LOCAL model / codec the sandbox cannot ship (CLIP, NLI, CTC, aesthetic
#: predictors, OCR, cv2 frame decode). Value = (pattern function to build on,
#: what the user must supply). Resolving one of these raises
#: NeedsModelKernel — deliberately distinct from the typo KeyError.
MODEL_KERNEL_REGISTRY: dict[str, tuple[Callable, str]] = {
    "CLIPScoreFilter": (filters.score_filter, "CLIP image-text score UDF"),
    "ImageClipFilter": (filters.score_filter, "CLIP image-text score UDF"),
    "ImageCLIPEvaluator": (filters.score_filter, "CLIP image-text score UDF"),
    "ImageLongCLIPEvaluator": (filters.score_filter, "LongCLIP score UDF"),
    "ImageVQAScoreEvaluator": (filters.score_filter, "VQAScore model UDF"),
    "ImageAestheticFilter": (
        mlphead.aesthetic_filter,
        "CLIP image-embedding UDF + head checkpoint weights (the MLP "
        "forward pass itself is real — functions/mlphead.py)"),
    "CatFilter": (filters.score_filter, "category-classifier UDF"),
    "ImageCatFilter": (filters.score_filter, "category-classifier UDF"),
    "ImageComplexityFilter": (filters.range_filter, "complexity-scorer UDF"),
    "ImageConsistencyFilter": (filters.score_filter, "NLI/consistency UDF"),
    "ImageSensitiveFilter": (filters.score_filter, "safety-classifier UDF"),
    "ImageBboxGenerator": (
        multimodal.decode_and_featurize, "detection-model kernel"),
    "VideoAestheticEvaluator": (
        mlphead.aesthetic_filter,
        "CLIP frame-embedding UDF + head weights (MLP forward real)"),
    "VideoAestheticFilter": (
        mlphead.aesthetic_filter,
        "CLIP frame-embedding UDF + head weights (MLP forward real)"),
    "VideoLuminanceEvaluator": (
        multimodal.luminance_stats,
        "frame-decode (cv2) kernel for entropy-coded video — the Rec.601 "
        "luma aggregation itself is real and BMP decodes in-engine"),
    "VideoLuminanceFilter": (
        multimodal.luminance_stats,
        "frame-decode (cv2) kernel for entropy-coded video — the Rec.601 "
        "luma aggregation itself is real and BMP decodes in-engine"),
    "VideoOCREvaluator": (filters.score_filter, "OCR-model UDF"),
    "VideoOCRFilter": (filters.score_filter, "OCR-model UDF"),
    "VideoClipFilter": (filters.nested_clip_filter, "CLIP score UDF per clip"),
    "VideoMotionScoreFilter": (
        multimodal.decode_and_featurize, "frame-decode + optical-flow kernel"),
    "VideoFrameFilter": (
        multimodal.decode_and_featurize, "frame-decode (cv2) kernel"),
    "CTCForcedAlignmentSampleEvaluator": (
        align.align_spans,
        "acoustic CTC emissions (frame log-prob) serving UDF — the "
        "forced-alignment Viterbi/spans themselves are real "
        "(operators/align.py)"),
}


class NeedsModelKernel(LookupError):
    """The name is a KNOWN reference operator whose Spark plumbing exists,
    but a model/codec kernel must be supplied — not a typo."""

    def __init__(self, name: str, pattern: Callable, supply: str):
        self.pattern = pattern
        self.supply = supply
        super().__init__(
            f"operator {name!r} needs a model kernel this engine does not "
            f"ship: supply a {supply}, then build on "
            f"{pattern.__module__}.{pattern.__name__} (see README §model "
            "kernels)"
        )


def get_operator(name: str, allow_patterns: bool = False) -> Callable:
    """Resolve a reference operator name; unknown names raise KeyError with
    close-match suggestions (the reference's fuzzy lookup UX); known names
    whose kernel is user-supplied raise NeedsModelKernel (or return the
    pattern function when ``allow_patterns=True``)."""
    if name in OPERATOR_REGISTRY:
        return OPERATOR_REGISTRY[name]
    if name in MODEL_KERNEL_REGISTRY:
        pattern, supply = MODEL_KERNEL_REGISTRY[name]
        if allow_patterns:
            return pattern
        raise NeedsModelKernel(name, pattern, supply)
    every = {**OPERATOR_REGISTRY, **MODEL_KERNEL_REGISTRY}
    ci = {k.lower(): k for k in every}
    if name.lower() in ci:
        return get_operator(ci[name.lower()], allow_patterns)
    close = difflib.get_close_matches(name, every.keys(), n=3, cutoff=0.5)
    hint = f" — did you mean {', '.join(close)}?" if close else ""
    raise KeyError(f"unknown operator {name!r}{hint}")
