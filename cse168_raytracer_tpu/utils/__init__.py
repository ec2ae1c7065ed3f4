"""Cross-cutting utilities: console logging, phase profiling,
checkpoint/resume (reference Console.{h,cpp}, Stats.{h,cpp},
Utility.cpp getTime — and the aux subsystems SURVEY.md §5 calls for
that the reference lacks)."""
