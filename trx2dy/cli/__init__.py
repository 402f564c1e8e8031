"""Command-line interfaces mirroring the reference scripts:

  trx2dy.cli.run_inference  <->  run_inference.py   (Dynamics pipeline)
  trx2dy.cli.fold           <->  folding/folding.py (single-npz folder)
  trx2dy.cli.evaluate       <->  evaluate.py        (TM-score summary)
  trx2dy.cli.cluster        <->  cluster.py         (ensemble clustering)
  trx2dy.cli.predict        <->  trRosettaX2/predict.py (e2e static model)
"""
