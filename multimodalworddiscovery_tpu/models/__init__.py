"""Aligner models.

Each aligner module exposes a functional API (params are pytrees; every step
is a pure jittable function):

  init(corpus, ...) -> params
  em_step(params, corpus) -> (params, stats)        # EM trainers
  align(params, corpus) -> [N, Ts] int32            # 0 = NULL, else 1-based
                                                    #   trg position
  loglik(params, corpus) -> scalar

Reference counterparts (SURVEY.md §2): model1 ↔ C5 mixture/IBM-1 word
discoverer; hmm ↔ C6 discrete HMM aligner; hmm_gaussian ↔ C7 Gaussian/DNN-HMM
hybrid; attention ↔ C8 neural attention aligner; segmental baselines ↔ C9.
"""
