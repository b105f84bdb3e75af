! Fortran bindings for amgcl_tpu via iso_c_binding — capability parity
! with the reference's fortran/amgcl.f90: the same create/solve/destroy
! C API (lib/amgcl_tpu.h), callable from Fortran with zero-copy arrays.
!
! Usage:
!   use amgcl_tpu
!   integer(c_int64_t) :: h, iters
!   real(c_double) :: err
!   h = amgcl_tpu_solver_create(n, ptr, col, val, params // c_null_char)
!   rc = amgcl_tpu_solver_solve(h, rhs, x, n, iters, err)
!   call amgcl_tpu_solver_destroy(h)

module amgcl_tpu
  use iso_c_binding
  implicit none

  interface
     function amgcl_tpu_solver_create(n, ptr, col, val, params_json) &
          bind(C, name="amgcl_tpu_solver_create") result(handle)
       use iso_c_binding
       integer(c_int64_t), value :: n
       integer(c_int64_t), intent(in) :: ptr(*)
       integer(c_int64_t), intent(in) :: col(*)
       real(c_double), intent(in) :: val(*)
       character(kind=c_char), intent(in) :: params_json(*)
       integer(c_int64_t) :: handle
     end function amgcl_tpu_solver_create

     function amgcl_tpu_solver_solve(handle, rhs, x, n, iters, error) &
          bind(C, name="amgcl_tpu_solver_solve") result(rc)
       use iso_c_binding
       integer(c_int64_t), value :: handle
       real(c_double), intent(in) :: rhs(*)
       real(c_double), intent(inout) :: x(*)
       integer(c_int64_t), value :: n
       integer(c_int64_t), intent(out) :: iters
       real(c_double), intent(out) :: error
       integer(c_int) :: rc
     end function amgcl_tpu_solver_solve

     ! Distributed solver over the device mesh (the role of the
     ! reference MPI binding, lib/amgcl_mpi.h); n_shards = 0 uses every
     ! visible device.  Solve/destroy via the same handle calls.
     function amgcl_tpu_dist_solver_create(n, ptr, col, val, n_shards, &
          params_json) bind(C, name="amgcl_tpu_dist_solver_create") &
          result(handle)
       use iso_c_binding
       integer(c_int64_t), value :: n
       integer(c_int64_t), intent(in) :: ptr(*)
       integer(c_int64_t), intent(in) :: col(*)
       real(c_double), intent(in) :: val(*)
       integer(c_int64_t), value :: n_shards
       character(kind=c_char), intent(in) :: params_json(*)
       integer(c_int64_t) :: handle
     end function amgcl_tpu_dist_solver_create

     subroutine amgcl_tpu_solver_destroy(handle) &
          bind(C, name="amgcl_tpu_solver_destroy")
       use iso_c_binding
       integer(c_int64_t), value :: handle
     end subroutine amgcl_tpu_solver_destroy
  end interface

end module amgcl_tpu
