"""Downstream benchmark harness (reference evals/, SURVEY.md C27-C33).

Entry points (each also a `python -m omnibiote_tpu.evals.<name>` CLI):
  gue.run_gue                  GUE DNA classification suite
  tape.run_tape                TAPE (ss3/ss8, remote homology, fluorescence,
                               stability)
  proteinglue.run_proteinglue  ProteinGLUE per-residue suite
  contact.run_contact_eval     TAPE ProteinNet contact prediction
  pronab.run_pronab            ProNAB binding affinity (crossval/train-all)
  pdb_contact.run_pdb_contact  PDB peptide-nucleotide contact
  deepnap.run_deepnap          DeePNAP CNN baseline
"""
