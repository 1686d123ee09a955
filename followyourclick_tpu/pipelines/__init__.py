from followyourclick_tpu.pipelines.animation import (  # noqa: F401
    AnimationPipeline,
    SampleSpec,
)
